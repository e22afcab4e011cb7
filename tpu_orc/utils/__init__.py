from .profiling import Metrics, StageTimer, device_trace  # noqa: F401
