from dan_tpu.models.detector import (
    count_params,
    detector_forward,
    init_detector_params,
)
from dan_tpu.models.vgg import TAP_CHANNELS, TAP_NAMES

__all__ = [
    "TAP_CHANNELS",
    "TAP_NAMES",
    "count_params",
    "detector_forward",
    "init_detector_params",
]
