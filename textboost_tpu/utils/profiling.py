"""Tracing / profiling hooks.

The reference has none beyond a wall-clock total (SURVEY.md §5;
train_textboost.py:1023,1268-1269).  TPU-native additions: jax.profiler
trace capture around a step window (viewable in XProf/TensorBoard), a
lightweight step timer with rolling steps/sec, and device memory stats.
"""
from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """Capture a jax.profiler trace into profile_dir (no-op when None)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + wall time, logged alongside training metrics."""

    def __init__(self, window: int = 50):
        self.times = collections.deque(maxlen=window)
        self.start = time.perf_counter()
        self._last = self.start

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        self.times.append(now - self._last)
        self._last = now
        dt = sum(self.times) / len(self.times)
        return {
            "step_time_ms": dt * 1000.0,
            "steps_per_sec": 1.0 / dt if dt > 0 else 0.0,
            "wall_time_s": now - self.start,
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (empty on backends without stats)."""
    out = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[f"dev{i}_bytes_in_use_gib"] = stats.get("bytes_in_use", 0) / 2**30
            out[f"dev{i}_peak_bytes_gib"] = stats.get("peak_bytes_in_use", 0) / 2**30
    return out
