"""Wrapper optimizers: EMA, Average, Lookahead, Batched, ExponentialDecay.

Each wraps a nested optimizer and augments its state; all run fully inside the
jitted training step (conditional nested steps use lax.cond, the analog of the
reference's host-side `if (step % N == 0)` branches).

Reference semantics (file:line in /root/reference/include/tiny-cuda-nn/optimizers/):
  - EMA (ema.h:45-120): after the nested step, ema' stores the *debiased*
    moving average: raw_t = decay*raw_{t-1} + (1-decay)*w_t;
    custom_weights = raw_t / (1 - decay^t). If the nested optimizer exposes
    custom weights, the EMA filters those instead.
  - Average (average.h:45-120): ring buffer of the last n_samples weight
    snapshots; average += (w - buffer[t % N]) / N; buffer[t % N] = w.
  - Lookahead (lookahead.h:45-115): BEFORE the nested step, when
    nested.step % n_steps == 0: w = slow*(1-alpha) + w*alpha; slow = w
    (slow weights initialized from w at step 0).
  - Batched (batched.h:45-110): pool = 0 at the start of each window;
    pool += g / N each step; nested step on the pooled gradient every N steps.
  - ExponentialDecay (exponential_decay.h:46-110): multiplies the nested lr by
    decay_base whenever step >= decay_start, step <= decay_end, and
    (step - decay_start) % decay_interval == 0; implemented by threading a
    traced lr-factor through `lr_scale` so no recompilation is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Optimizer


class _WrapperOptimizer(Optimizer):
    otype = "Wrapper"

    def __init__(self, nested: Optimizer):
        super().__init__()
        self.nested = nested

    def allocate(self, n_weights, layer_sizes):
        super().allocate(n_weights, layer_sizes)
        self.nested.allocate(n_weights, layer_sizes)

    @property
    def learning_rate(self) -> float:
        return self.nested.learning_rate

    def set_learning_rate(self, lr: float) -> None:
        self.nested.set_learning_rate(lr)

    def custom_weights(self, state, weights=None):
        return self.nested.custom_weights(state["nested"], weights)

    def update_hyperparams(self, params: dict) -> None:
        if "nested" in params:
            self.nested.update_hyperparams(params["nested"])


class EmaOptimizer(_WrapperOptimizer):
    otype = "EMA"

    def __init__(self, nested: Optimizer, decay: float = 0.99):
        super().__init__(nested)
        self.decay = float(decay)

    def init_state(self):
        return {
            "nested": self.nested.init_state(),
            "ema": jnp.zeros((self.n_weights,), jnp.float32),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        nested_state, new_w = self.nested.step(
            state["nested"], loss_scale, weights, grads, lr_scale
        )
        src = self.nested.custom_weights(nested_state, new_w)
        if src is None:
            src = new_w
        ema = self.decay * state["ema"] + (1 - self.decay) * src
        return (
            {"nested": nested_state, "ema": ema, "step": state["step"] + 1},
            new_w,
        )

    def custom_weights(self, state, weights=None):
        t = state["step"].astype(jnp.float32)
        debias = 1.0 / (1.0 - self.decay**t)
        return state["ema"] * jnp.where(jnp.isfinite(debias), debias, 0.0)

    def hyperparams(self):
        return {
            "otype": "EMA",
            "decay": self.decay,
            "nested": self.nested.hyperparams(),
        }

    def update_hyperparams(self, params: dict) -> None:
        if "decay" in params:
            self.decay = params["decay"]
        super().update_hyperparams(params)


class AverageOptimizer(_WrapperOptimizer):
    otype = "Average"

    def __init__(self, nested: Optimizer, n_samples: int = 128):
        super().__init__(nested)
        self.n_samples = int(n_samples)

    def init_state(self):
        return {
            "nested": self.nested.init_state(),
            "samples": jnp.zeros((self.n_samples, self.n_weights), jnp.float32),
            "average": jnp.zeros((self.n_weights,), jnp.float32),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        nested_state, new_w = self.nested.step(
            state["nested"], loss_scale, weights, grads, lr_scale
        )
        idx = (state["step"] % self.n_samples).astype(jnp.int32)
        old = state["samples"][idx]
        average = state["average"] + (new_w - old) / self.n_samples
        samples = state["samples"].at[idx].set(new_w)
        return (
            {
                "nested": nested_state,
                "samples": samples,
                "average": average,
                "step": state["step"] + 1,
            },
            new_w,
        )

    def custom_weights(self, state, weights=None):
        return state["average"]

    def hyperparams(self):
        return {
            "otype": "Average",
            "n_samples": self.n_samples,
            "nested": self.nested.hyperparams(),
        }

    def update_hyperparams(self, params: dict) -> None:
        if "n_samples" in params:
            self.n_samples = int(params["n_samples"])
        super().update_hyperparams(params)


class LookaheadOptimizer(_WrapperOptimizer):
    otype = "Lookahead"

    def __init__(self, nested: Optimizer, alpha: float = 0.5, n_steps: int = 16):
        super().__init__(nested)
        self.alpha = float(alpha)
        self.n_steps = int(n_steps)

    def init_state(self):
        return {
            "nested": self.nested.init_state(),
            "slow": jnp.zeros((self.n_weights,), jnp.float32),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        t = state["step"]
        slow = jnp.where(t == 0, weights, state["slow"])
        sync = (t % self.n_steps) == 0
        blended = slow * (1.0 - self.alpha) + weights * self.alpha
        weights = jnp.where(sync, blended, weights)
        slow = jnp.where(sync, blended, slow)
        nested_state, new_w = self.nested.step(
            state["nested"], loss_scale, weights, grads, lr_scale
        )
        return (
            {"nested": nested_state, "slow": slow, "step": t + 1},
            new_w,
        )

    def custom_weights(self, state, weights=None):
        return state["slow"]

    def hyperparams(self):
        return {
            "otype": "Lookahead",
            "alpha": self.alpha,
            "n_steps": self.n_steps,
            "nested": self.nested.hyperparams(),
        }

    def update_hyperparams(self, params: dict) -> None:
        if "alpha" in params:
            self.alpha = params["alpha"]
        if "n_steps" in params:
            self.n_steps = int(params["n_steps"])
        super().update_hyperparams(params)


class BatchedOptimizer(_WrapperOptimizer):
    otype = "Batched"

    def __init__(self, nested: Optimizer, batch_size_multiplier: int = 16):
        super().__init__(nested)
        self.batch_size_multiplier = int(batch_size_multiplier)

    def init_state(self):
        return {
            "nested": self.nested.init_state(),
            "pool": jnp.zeros((self.n_weights,), jnp.float32),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        n = self.batch_size_multiplier
        t = state["step"]
        pool = jnp.where(t % n == 0, 0.0, state["pool"])
        pool = pool + grads.astype(jnp.float32) / n
        t = t + 1

        def do_nested(args):
            nested_state, w = args
            return self.nested.step(nested_state, loss_scale, w, pool, lr_scale)

        def skip(args):
            return args

        nested_state, new_w = jax.lax.cond(
            t % n == 0, do_nested, skip, (state["nested"], weights)
        )
        return (
            {"nested": nested_state, "pool": pool, "step": t},
            new_w,
        )

    def hyperparams(self):
        return {
            "otype": "Batched",
            "batch_size_multiplier": self.batch_size_multiplier,
            "nested": self.nested.hyperparams(),
        }

    def update_hyperparams(self, params: dict) -> None:
        if "batch_size_multiplier" in params:
            self.batch_size_multiplier = int(params["batch_size_multiplier"])
        super().update_hyperparams(params)


class ExponentialDecayOptimizer(_WrapperOptimizer):
    otype = "ExponentialDecay"

    def __init__(
        self,
        nested: Optimizer,
        decay_base: float = 0.1,
        decay_start: int = 10000,
        decay_end: int = 10000000,
        decay_interval: int = 10000,
    ):
        super().__init__(nested)
        self.decay_base = float(decay_base)
        self.decay_start = int(decay_start)
        self.decay_end = int(decay_end)
        self.decay_interval = int(decay_interval)

    def init_state(self):
        return {
            "nested": self.nested.init_state(),
            "lr_factor": jnp.ones((), jnp.float32),
        }

    def step(self, state, loss_scale, weights, grads, lr_scale=1.0):
        # exponential_decay.h:61-69 - uses the nested optimizer's step count
        # *before* the nested step.
        t = _nested_step_count(state["nested"])
        decay_now = jnp.logical_and(
            jnp.logical_and(t >= self.decay_start, t <= self.decay_end),
            (t - self.decay_start) % self.decay_interval == 0,
        )
        factor = state["lr_factor"] * jnp.where(decay_now, self.decay_base, 1.0)
        nested_state, new_w = self.nested.step(
            state["nested"], loss_scale, weights, grads, lr_scale * factor
        )
        return ({"nested": nested_state, "lr_factor": factor}, new_w)

    def hyperparams(self):
        return {
            "otype": "ExponentialDecay",
            "decay_base": self.decay_base,
            "decay_start": self.decay_start,
            "decay_end": self.decay_end,
            "decay_interval": self.decay_interval,
            "nested": self.nested.hyperparams(),
        }

    def update_hyperparams(self, params: dict) -> None:
        for k in ("decay_base", "decay_start", "decay_end", "decay_interval"):
            if k in params:
                setattr(self, k, params[k])
        super().update_hyperparams(params)


def _nested_step_count(nested_state):
    """Fetch the innermost 'step' counter from a nested optimizer state."""
    s = nested_state
    while isinstance(s, dict) and "step" not in s and "nested" in s:
        s = s["nested"]
    if isinstance(s, dict) and "step" in s:
        return s["step"]
    return jnp.zeros((), jnp.uint32)
