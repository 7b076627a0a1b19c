from dan_tpu.ops.bbox_vote import VoteResult, bbox_vote
from dan_tpu.ops.nms import NMSResult, greedy_nms, topk_select
from dan_tpu.ops.postprocess import postprocess_batch, postprocess_one
from dan_tpu.ops.preprocess import (
    CropParams,
    color_distort,
    crop_and_resize,
    hflip,
    hsv_to_rgb,
    normalize_image,
    resize_image,
    rgb_to_hsv,
    train_preprocess_one,
    transform_boxes,
)

__all__ = [
    "CropParams",
    "NMSResult",
    "VoteResult",
    "bbox_vote",
    "color_distort",
    "crop_and_resize",
    "greedy_nms",
    "hflip",
    "hsv_to_rgb",
    "normalize_image",
    "postprocess_batch",
    "postprocess_one",
    "resize_image",
    "rgb_to_hsv",
    "topk_select",
    "train_preprocess_one",
    "transform_boxes",
]
