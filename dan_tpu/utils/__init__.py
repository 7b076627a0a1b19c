from dan_tpu.utils.logging import MetricsLogger
from dan_tpu.utils.profiling import ThroughputMeter, maybe_trace

__all__ = ["MetricsLogger", "ThroughputMeter", "maybe_trace"]
