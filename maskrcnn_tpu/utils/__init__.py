from maskrcnn_tpu.utils.cache import enable_compilation_cache
from maskrcnn_tpu.utils.metrics import MetricLogger
from maskrcnn_tpu.utils.profiler import step_timer, trace_context

__all__ = [
    "enable_compilation_cache",
    "MetricLogger",
    "step_timer",
    "trace_context",
]
