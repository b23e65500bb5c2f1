from .profiling import StageTimer, trace, get_logger  # noqa: F401
