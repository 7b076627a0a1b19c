"""Jaccard overlap (IoU) — the core primitive of matching, NMS and bbox-vote.

Behavior contract (SURVEY.md §2 'Matching + encoding' [B]): jaccard IoU of
anchors x gt.  All boxes here are corner format (x1, y1, x2, y2), pixels.
Pure XLA; the tiled Pallas variant for the big anchorsxgt matrix lives in
dan_tpu.ops.matching_pallas.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner boxes -> (...,) areas; degenerate boxes -> 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (A, 4) and (B, 4) corner boxes -> (A, B) float32.

    Degenerate / padded boxes (zero area) yield IoU 0 against everything.
    """
    a = boxes_a[:, None, :]  # (A, 1, 4)
    b = boxes_b[None, :, :]  # (1, B, 4)
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = box_area(boxes_a)[:, None] + box_area(boxes_b)[None, :] - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def iou_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of a single (4,) corner box against (N, 4) boxes -> (N,)."""
    ix1 = jnp.maximum(box[0], boxes[:, 0])
    iy1 = jnp.maximum(box[1], boxes[:, 1])
    ix2 = jnp.minimum(box[2], boxes[:, 2])
    iy2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = box_area(box) + box_area(boxes) - inter
    return jnp.where(union > 0.0, inter / union, 0.0)
