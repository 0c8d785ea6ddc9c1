from .logging import MetricLogger, get_logger
from .timers import PhaseTimer, trace_annotation
from .cache import enable_compilation_cache
from .init import zeros_from_shapes

__all__ = [
    "MetricLogger",
    "get_logger",
    "PhaseTimer",
    "trace_annotation",
    "enable_compilation_cache",
    "zeros_from_shapes",
]
