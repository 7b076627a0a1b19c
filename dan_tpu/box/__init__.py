from dan_tpu.box.anchors import (
    center_to_corner,
    corner_to_center,
    generate_anchors,
    generate_anchors_np,
)
from dan_tpu.box.decode import decode_boxes
from dan_tpu.box.iou import iou_one_to_many, pairwise_iou
from dan_tpu.box.matching import (
    MatchTargets,
    encode_boxes,
    match_anchors,
    match_anchors_batch,
)

__all__ = [
    "MatchTargets",
    "center_to_corner",
    "corner_to_center",
    "decode_boxes",
    "encode_boxes",
    "generate_anchors",
    "generate_anchors_np",
    "iou_one_to_many",
    "match_anchors",
    "match_anchors_batch",
    "pairwise_iou",
]
