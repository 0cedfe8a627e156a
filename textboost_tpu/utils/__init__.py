from .profiling import StepTimer, device_memory_stats, trace  # noqa: F401
