"""Optimizer protocol.

Mirror of the reference's Optimizer<T> interface (optimizer.h:39-63), adapted
to JAX's functional style: optimizer state is an explicit pytree threaded
through a pure `step` function (which runs *inside* the jitted training step,
so the whole update fuses into a handful of XLA kernels - the analog of the
reference's single fused CUDA kernels, e.g. adam.h:47-121).

Contract:
  - `allocate(n_weights, layer_sizes)` fixes static sizes (optimizer.h:45).
    `layer_sizes` lists (rows, cols) of *matrix* (network) params, which by
    the flat-buffer convention occupy the FIRST sum(r*c) entries; everything
    after is "non-matrix" (encoding tables etc.) - the distinction drives
    Adam's matrix-only L2 (adam.h:88-91) and Novograd's per-layer moments.
  - `init_state() -> pytree`
  - `step(state, loss_scale, weights_fp32, grads) -> (state, new_weights)`.
    `grads` are fp32, still multiplied by loss_scale (divided out inside,
    adam.h:75).
  - `custom_weights(state)` returns averaged/slow weights for inference (EMA,
    Average, Lookahead - optimizer.h:53, plugged into inference params by the
    trainer per trainer.h:329-333), or None.
"""

from __future__ import annotations

import abc

import numpy as np


class Optimizer(abc.ABC):
    def __init__(self):
        self._n_weights = 0
        self._layer_sizes = []

    # -- setup ---------------------------------------------------------------
    def allocate(self, n_weights: int, layer_sizes) -> None:
        self._n_weights = int(n_weights)
        self._layer_sizes = [(int(r), int(c)) for r, c in layer_sizes]

    @property
    def n_weights(self) -> int:
        return self._n_weights

    @property
    def n_matrix_weights(self) -> int:
        return sum(r * c for r, c in self._layer_sizes)

    @property
    def layer_sizes(self):
        return list(self._layer_sizes)

    #: Composite partitioning hint (optimizers/composite.h:46-91); None means
    #: "all remaining params".
    n_params_to_optimize: int | None = None

    # -- state / step ----------------------------------------------------------
    @abc.abstractmethod
    def init_state(self):
        ...

    @abc.abstractmethod
    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        """Returns (new_state, new_weights); pure/traceable.

        `lr_scale` is a (possibly traced) multiplier on the learning rate,
        used by ExponentialDecay to vary lr inside a jitted step."""

    def custom_weights(self, state, weights=None):
        """Averaged/slow weights for inference, or None. `weights` are the
        current live weights (needed by Composite to fill segments whose
        nested optimizer has no custom weights)."""
        return None

    # -- introspection -----------------------------------------------------------
    @property
    @abc.abstractmethod
    def learning_rate(self) -> float:
        ...

    @abc.abstractmethod
    def set_learning_rate(self, lr: float) -> None:
        ...

    @abc.abstractmethod
    def hyperparams(self) -> dict:
        ...

    @abc.abstractmethod
    def update_hyperparams(self, params: dict) -> None:
        ...

    def __repr__(self):
        return f"{type(self).__name__}({self.hyperparams()})"
