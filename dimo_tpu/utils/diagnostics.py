"""Observability hooks: step timing, profiler traces, NaN checking.

The reference's analogs: CUDA-event step timing (`main_train_dimo.py:222-224,
449-451`), the test_fps wall-clock harness, and its (half-applied) cudnn
determinism flags. On TPU the counterparts are jax.profiler traces, a
deterministic-by-construction functional program, and jit-level NaN checks.
"""
from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Wall-clock per-step timing with EMA; device-synchronizing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms = None
        self.last_ms = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.last_ms = (time.perf_counter() - self._t0) * 1000.0
        self.ema_ms = (self.last_ms if self.ema_ms is None
                       else (1 - self.alpha) * self.ema_ms
                       + self.alpha * self.last_ms)
        return self.last_ms

    @property
    def steps_per_sec(self) -> float:
        return 1000.0 / self.ema_ms if self.ema_ms else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks():
    """Turn on jit-level NaN debugging (functional-purity analog of the
    reference's determinism/sanitizer intent)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks():
    jax.config.update("jax_debug_nans", False)
