from .logging import MetricLogger, get_logger
from .timers import PhaseTimer, trace_annotation

__all__ = ["MetricLogger", "get_logger", "PhaseTimer", "trace_annotation"]
