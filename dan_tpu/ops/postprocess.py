"""Detection post-processing: decode -> score filter -> top-k -> NMS,
entirely on-device, producing the reference's detection-dict contract
(SURVEY.md §3.3: {bboxes, scores} per image, fixed MAX_DET padding with a
validity mask instead of dynamic shapes).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dan_tpu.box.decode import decode_boxes
from dan_tpu.config import AnchorConfig, PostprocessConfig
from dan_tpu.ops.nms import greedy_nms, topk_select


from dan_tpu.utils.platform import on_tpu as _on_tpu  # shared dispatch gate


def _run_nms(boxes, scores, post_config: PostprocessConfig):
    """Dispatch to the Pallas kernel on TPU, XLA while_loop elsewhere
    (identical semantics — parity-tested)."""
    if post_config.use_pallas_nms and _on_tpu():
        from dan_tpu.ops.nms_pallas import greedy_nms_pallas

        return greedy_nms_pallas(
            boxes,
            scores,
            post_config.nms_iou_threshold,
            post_config.max_detections,
            score_threshold=0.0,
        )
    return greedy_nms(
        boxes,
        scores,
        post_config.nms_iou_threshold,
        post_config.max_detections,
        score_threshold=0.0,
    )


def filter_and_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    post_config: PostprocessConfig,
):
    """THE score/degenerate-box filter + pre-NMS top-k (one definition:
    drop sub-threshold and degenerate-after-clip boxes — zero-area boxes
    have IoU 0 with everything and would all survive greedy NMS —
    reference `select_bboxes` semantics [K]). Every detection path
    (single-image, batched, TTA) goes through this function, so a
    semantics change can never make the paths drift."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    keep = (scores >= post_config.score_threshold) & (w > 1.0) & (h > 1.0)
    scores = jnp.where(keep, scores, 0.0)
    return topk_select(boxes, scores, post_config.pre_nms_topk)


def score_filter_topk_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    post_config: PostprocessConfig,
):
    """Shared tail of the per-image detection paths: filter_and_topk, then
    greedy NMS."""
    boxes_k, scores_k = filter_and_topk(boxes, scores, post_config)
    return _run_nms(boxes_k, scores_k, post_config)


def postprocess_one(
    cls_logits: jnp.ndarray,
    loc_preds: jnp.ndarray,
    anchors_center: jnp.ndarray,
    anchor_config: AnchorConfig,
    post_config: PostprocessConfig,
    image_h: float,
    image_w: float,
) -> Dict[str, jnp.ndarray]:
    """Single image: (A, 2) logits + (A, 4) offsets -> detection dict.

    Returns {'bboxes': (MAX_DET, 4), 'scores': (MAX_DET,), 'valid':
    (MAX_DET,)} — corner boxes in input-image pixels.
    """
    scores = jax.nn.softmax(cls_logits, axis=-1)[:, 1]
    boxes = decode_boxes(
        loc_preds, anchors_center, anchor_config.prior_scaling, image_h, image_w
    )
    res = score_filter_topk_nms(boxes, scores, post_config)
    return {"bboxes": res.boxes, "scores": res.scores, "valid": res.valid}


def postprocess_batch(
    cls_logits: jnp.ndarray,
    loc_preds: jnp.ndarray,
    anchors_center: jnp.ndarray,
    anchor_config: AnchorConfig,
    post_config: PostprocessConfig,
    image_h: float,
    image_w: float,
) -> Dict[str, jnp.ndarray]:
    """Batched postprocess over (B, A, 2)/(B, A, 4).

    On TPU the NMS stage runs as ONE natively-batched Pallas kernel (all
    rows' greedy loops in lockstep — 3x faster than vmapping the per-image
    kernel at batch 16); decode/filter/top-k are elementwise and stay
    vmapped.  Results are bit-identical to vmap(postprocess_one).
    """
    if post_config.use_pallas_nms and _on_tpu():
        from dan_tpu.ops.nms_batched_pallas import greedy_nms_pallas_batched

        def prep(cls_l, loc_p):
            scores = jax.nn.softmax(cls_l, axis=-1)[:, 1]
            boxes = decode_boxes(
                loc_p, anchors_center, anchor_config.prior_scaling,
                image_h, image_w,
            )
            return filter_and_topk(boxes, scores, post_config)

        boxes_k, scores_k = jax.vmap(prep)(cls_logits, loc_preds)
        res = greedy_nms_pallas_batched(
            boxes_k,
            scores_k,
            post_config.nms_iou_threshold,
            post_config.max_detections,
        )
        return {"bboxes": res.boxes, "scores": res.scores, "valid": res.valid}
    return jax.vmap(
        lambda c, l: postprocess_one(
            c, l, anchors_center, anchor_config, post_config, image_h, image_w
        )
    )(cls_logits, loc_preds)
