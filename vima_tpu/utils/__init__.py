from vima_tpu.utils.profiling import LatencyTracker, MetricsLogger, step_trace, trace_to

__all__ = ["LatencyTracker", "MetricsLogger", "step_trace", "trace_to"]
