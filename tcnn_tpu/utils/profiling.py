"""Performance observability (SURVEY.md 5.1).

The reference's observability is throughput printouts + allocation byte
counts; the TPU equivalents here are a step timer with samples/s and an
optional jax.profiler trace capture for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Throughput meter: wrap training steps, read .steps_per_sec /
    .samples_per_sec. Forces device sync only when read."""

    def __init__(self, batch_size: int):
        self.batch_size = int(batch_size)
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0
        self._last = None

    def step(self, result=None):
        """Count one step; pass the step's output to enable sync-on-read."""
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._steps = 0
        self._steps += 1
        self._last = result
        return result

    def _elapsed(self):
        if self._last is not None:
            jax.block_until_ready(self._last)
        return time.perf_counter() - (self._t0 or time.perf_counter())

    @property
    def steps_per_sec(self) -> float:
        dt = self._elapsed()
        return self._steps / dt if dt > 0 else 0.0

    @property
    def samples_per_sec(self) -> float:
        dt = self._elapsed()
        return self._steps * self.batch_size / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard):

        with tcnn_tpu.utils.profiling.trace("/tmp/trace"):
            for _ in range(10):
                trainer.training_step(x, y)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
