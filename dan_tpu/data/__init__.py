from dan_tpu.data.augment import sample_data_anchor_crop
from dan_tpu.data.pipeline import TrainPipeline
from dan_tpu.data.synthetic import synthetic_batch, synthetic_sample
from dan_tpu.data.widerface import (
    ImageRecord,
    load_image_rgb,
    load_split,
    parse_bbx_gt,
)

__all__ = [
    "ImageRecord",
    "TrainPipeline",
    "load_image_rgb",
    "load_split",
    "parse_bbx_gt",
    "sample_data_anchor_crop",
    "synthetic_batch",
    "synthetic_sample",
]
