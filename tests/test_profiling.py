"""Profiling utilities."""
import time

from textboost_tpu.utils import StepTimer, device_memory_stats


def test_step_timer():
    t = StepTimer(window=4)
    for _ in range(3):
        time.sleep(0.01)
        m = t.tick()
    assert m["step_time_ms"] >= 10.0
    assert m["steps_per_sec"] > 0
    assert m["wall_time_s"] >= 0.03


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU
