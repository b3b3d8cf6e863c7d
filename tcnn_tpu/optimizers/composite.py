"""Composite optimizer - partitions the flat param vector among nested
optimizers (mirror of optimizers/composite.h:43-140).

Each nested optimizer config declares `n_params_to_optimize`; segment i covers
[offset_i, offset_i + n_i). In the reference the composite's total n_weights
comes purely from those declarations; we additionally allow the LAST nested
optimizer to omit it and absorb the remainder (a strictly-more-usable
superset, since the reference forces callers to know exact param counts).

`layer_sizes` are sliced per segment: layers fully inside a segment pass
through; a layer partially overlapping contributes its overlap as an
(n_overlap, 1) pseudo-layer (mirrors slice_weights, composite.h:30-41).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Optimizer


def _slice_layer_sizes(layer_sizes, offset, size):
    out = []
    pos = 0
    lo, hi = offset, offset + size
    for r, c in layer_sizes:
        n = r * c
        a, b = max(pos, lo), min(pos + n, hi)
        if b > a:
            if a == pos and b == pos + n:
                out.append((r, c))
            else:
                out.append((b - a, 1))
        pos += n
    return out


class CompositeOptimizer(Optimizer):
    otype = "Composite"

    def __init__(self, nested, n_params_per_nested):
        """`n_params_per_nested[i]` may be None only for the last entry."""
        super().__init__()
        self.nested = list(nested)
        self._declared = list(n_params_per_nested)

    def allocate(self, n_weights, layer_sizes):
        super().allocate(n_weights, layer_sizes)
        offsets = [0]
        for i, n in enumerate(self._declared):
            if n is None:
                if i != len(self._declared) - 1:
                    raise ValueError(
                        "only the last nested optimizer may omit n_params_to_optimize"
                    )
                n = n_weights - offsets[-1]
            offsets.append(offsets[-1] + int(n))
        if offsets[-1] != n_weights:
            raise ValueError(
                f"Composite optimizer covers {offsets[-1]} params, model has {n_weights}"
            )
        self._offsets = offsets
        for i, opt in enumerate(self.nested):
            size = offsets[i + 1] - offsets[i]
            opt.allocate(size, _slice_layer_sizes(layer_sizes, offsets[i], size))

    def init_state(self):
        return {"nested": [opt.init_state() for opt in self.nested]}

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        new_states = []
        new_weights = []
        for i, opt in enumerate(self.nested):
            lo, hi = self._offsets[i], self._offsets[i + 1]
            s, w = opt.step(
                state["nested"][i], loss_scale, weights[lo:hi], grads[lo:hi], lr_scale
            )
            new_states.append(s)
            new_weights.append(w)
        return {"nested": new_states}, jnp.concatenate(new_weights)

    def custom_weights(self, state, weights=None):
        # composite.h:79-88 - stitch nested custom weights, falling back to
        # live weights for segments without them. Returns None when no nested
        # optimizer has custom weights (so inference uses live params).
        if not any(
            opt.custom_weights(s, None) is not None
            for opt, s in zip(self.nested, state["nested"])
        ):
            return None
        parts = []
        for i, opt in enumerate(self.nested):
            lo, hi = self._offsets[i], self._offsets[i + 1]
            wseg = None if weights is None else weights[lo:hi]
            cw = opt.custom_weights(state["nested"][i], wseg)
            parts.append(wseg if cw is None else cw)
        return jnp.concatenate(parts)

    @property
    def learning_rate(self) -> float:
        return self.nested[0].learning_rate

    def set_learning_rate(self, lr: float) -> None:
        for opt in self.nested:
            opt.set_learning_rate(lr)

    def hyperparams(self):
        return {
            "otype": "Composite",
            "nested": [opt.hyperparams() for opt in self.nested],
        }

    def update_hyperparams(self, params: dict) -> None:
        if "nested" in params:
            for opt, p in zip(self.nested, params["nested"]):
                opt.update_hyperparams(p)
