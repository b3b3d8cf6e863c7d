"""Novograd (mirror of optimizers/novograd.h:45-140).

Layer-wise second moments: one scalar per *matrix layer*,
    v_l = beta2 * v_l + (1 - beta2) * ||g_l||^2 / loss_scale^2
first moments per parameter,
    m_i = beta1 * m_i + (1 - beta1) * g_i / (sqrt(v_layer(i)) + eps)
update
    w_i = weight_decay(rel*lr, abs*lr, w_i) - lr * m_i.

NOTE (reference behavior, replicated): only parameters covered by
`layer_sizes` - i.e. network matrix weights - are updated; non-matrix params
(encoding tables) are left untouched (novograd.h's step loops over m_layers
only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Optimizer


class NovogradOptimizer(Optimizer):
    def __init__(
        self,
        learning_rate: float = 1e-3,
        beta1: float = 0.9,
        beta2: float = 0.999,
        epsilon: float = 1e-8,
        relative_decay: float = 0.0,
        absolute_decay: float = 0.0,
    ):
        super().__init__()
        self.base_learning_rate = float(learning_rate)
        self.beta1 = float(beta1)
        self.beta2 = float(beta2)
        self.epsilon = float(epsilon)
        self.relative_decay = float(relative_decay)
        self.absolute_decay = float(absolute_decay)

    def _layer_segments(self):
        """segment id per matrix param + number of layers."""
        sizes = [r * c for r, c in self.layer_sizes]
        seg = np.repeat(np.arange(len(sizes)), sizes)
        return seg, len(sizes)

    def init_state(self):
        n_matrix = self.n_matrix_weights
        _, n_layers = self._layer_segments()
        return {
            "first_moments": jnp.zeros((n_matrix,), jnp.float32),
            "per_layer_second_moment": jnp.zeros((n_layers,), jnp.float32),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        n_matrix = self.n_matrix_weights
        seg, n_layers = self._layer_segments()
        seg = jnp.asarray(seg)

        g = grads[:n_matrix].astype(jnp.float32)
        w = weights[:n_matrix]

        # per-layer ||g||^2 (novograd.h:85-91); note the reference computes the
        # norm on the *scaled* grads then divides by loss_scale^2.
        norms = jnp.zeros((n_layers,), jnp.float32).at[seg].add(g * g)
        v = self.beta2 * state["per_layer_second_moment"] + (
            1 - self.beta2
        ) * norms / (loss_scale * loss_scale)

        g_unscaled = g / loss_scale
        m = self.beta1 * state["first_moments"] + (1 - self.beta1) * (
            g_unscaled / (jnp.sqrt(v)[seg] + self.epsilon)
        )

        lr = self.base_learning_rate * lr_scale
        decayed = (1 - self.relative_decay * lr) * w - jnp.copysign(
            self.absolute_decay * lr, w
        )
        new_w_matrix = decayed - lr * m

        new_weights = jnp.concatenate([new_w_matrix, weights[n_matrix:]])
        new_state = {
            "first_moments": m,
            "per_layer_second_moment": v,
            "step": state["step"] + 1,
        }
        return new_state, new_weights

    @property
    def learning_rate(self) -> float:
        return self.base_learning_rate

    def set_learning_rate(self, lr: float) -> None:
        self.base_learning_rate = float(lr)

    def hyperparams(self) -> dict:
        return {
            "otype": "Novograd",
            "learning_rate": self.base_learning_rate,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "epsilon": self.epsilon,
            "relative_decay": self.relative_decay,
            "absolute_decay": self.absolute_decay,
        }

    def update_hyperparams(self, params: dict) -> None:
        for key, attr in [
            ("learning_rate", "base_learning_rate"),
            ("beta1", "beta1"),
            ("beta2", "beta2"),
            ("epsilon", "epsilon"),
            ("relative_decay", "relative_decay"),
            ("absolute_decay", "absolute_decay"),
        ]:
            if key in params:
                setattr(self, attr, params[key])
