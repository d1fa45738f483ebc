"""Performance introspection: per-step timing + JAX profiler traces.

The reference's only introspection is cargo benches and `shard_stats()`
(SURVEY.md §5); here we add a step-timer with scenes/sec counters and a thin
wrapper over the JAX profiler for TPU trace capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


class StepTimer:
    """Rolling throughput counter for tracker steps."""

    def __init__(self, window: int = 256):
        self.samples = deque(maxlen=window)
        self.total_steps = 0
        self.total_scenes = 0

    @contextlib.contextmanager
    def step(self, scenes: int = 1):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.samples.append((dt, scenes))
        self.total_steps += 1
        self.total_scenes += scenes

    @property
    def steps_per_sec(self) -> float:
        if not self.samples:
            return 0.0
        t = sum(s[0] for s in self.samples)
        return len(self.samples) / t if t > 0 else 0.0

    @property
    def scenes_per_sec(self) -> float:
        if not self.samples:
            return 0.0
        t = sum(s[0] for s in self.samples)
        n = sum(s[1] for s in self.samples)
        return n / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "steps_per_sec": round(self.steps_per_sec, 2),
            "scenes_per_sec": round(self.scenes_per_sec, 2),
            "total_steps": self.total_steps,
            "total_scenes": self.total_scenes,
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/similari_tpu_trace"):
    """Capture a JAX profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
