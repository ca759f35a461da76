from maskrcnn_tpu.utils.metrics import MetricLogger
from maskrcnn_tpu.utils.profiler import step_timer, trace_context

__all__ = ["MetricLogger", "step_timer", "trace_context"]
