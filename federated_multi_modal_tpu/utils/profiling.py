"""Profiling / tracing harness.

The reference has no tracing at all (SURVEY §5: print-based LR/grad-norm
histories only).  TPU-native equivalent: ``jax.profiler`` traces around
training regions plus a wall-clock step timer that forces device
completion through a host transfer (``block_until_ready`` can return early
on tunneled PJRT backends).

Enable via ``cfg.TRAIN.PROFILE_DIR`` — the trainer wraps each epoch in a
trace; view with TensorBoard or xprof.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(profile_dir: str = ""):
    """jax.profiler trace context; no-op when dir is empty."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer with forced device sync on sample boundaries."""

    def __init__(self, sync_every: int = 20):
        self.sync_every = sync_every
        self.count = 0
        self.t0 = time.time()
        self.history = []

    def step(self, result=None):
        self.count += 1
        if self.count % self.sync_every == 0:
            if result is not None:
                jax.device_get(result)  # force completion
            dt = time.time() - self.t0
            self.history.append(dt / self.sync_every)
            self.t0 = time.time()

    @property
    def avg_step_seconds(self) -> float:
        return sum(self.history) / len(self.history) if self.history else 0.0


def annotate(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
