"""Plain SGD with L2 (mirror of optimizers/sgd.h:45-70)."""

from __future__ import annotations

import jax.numpy as jnp

from .base import Optimizer


class SGDOptimizer(Optimizer):
    def __init__(self, learning_rate: float = 1e-3, l2_reg: float = 1e-8):
        super().__init__()
        self.base_learning_rate = float(learning_rate)
        self.l2_reg = float(l2_reg)

    def init_state(self):
        return {"step": jnp.zeros((), jnp.uint32)}

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        g = grads.astype(jnp.float32) / loss_scale + self.l2_reg * weights
        new_w = weights - (self.base_learning_rate * lr_scale) * g
        return {"step": state["step"] + 1}, new_w

    @property
    def learning_rate(self) -> float:
        return self.base_learning_rate

    def set_learning_rate(self, lr: float) -> None:
        self.base_learning_rate = float(lr)

    def hyperparams(self) -> dict:
        return {
            "otype": "SGD",
            "learning_rate": self.base_learning_rate,
            "l2_reg": self.l2_reg,
        }

    def update_hyperparams(self, params: dict) -> None:
        if "learning_rate" in params:
            self.base_learning_rate = params["learning_rate"]
        if "l2_reg" in params:
            self.l2_reg = params["l2_reg"]
