"""On-device greedy NMS with fixed output shapes.

Behavior contract (SURVEY.md §2 'NMS + score filter' [B][K]): per-class
score threshold -> top-k preselect -> greedy IoU NMS -> top max_detections.
The reference runs this host-side via numpy/tf.py_func [B]; here it is a
fixed-shape XLA `lax.while_loop` (Pallas variant in
dan_tpu.ops.nms_pallas), bit-matching numpy's ordering: scores descend,
ties broken by lower index (argmax-first semantics).

All boxes corner-format, float32.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.box.iou import iou_one_to_many


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # (max_out, 4)
    scores: jnp.ndarray  # (max_out,)
    indices: jnp.ndarray  # (max_out,) into the input arrays
    valid: jnp.ndarray  # (max_out,) bool


def greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    score_threshold: float = 0.0,
) -> NMSResult:
    """Greedy NMS over (N, 4) boxes / (N,) scores -> fixed (max_out, ...).

    Suppression rule: IoU strictly greater than `iou_threshold`
    (matches the numpy oracle and the common Fast-R-CNN nms).
    """
    n = boxes.shape[0]
    active = scores > score_threshold

    def body(state):
        i, active, out_boxes, out_scores, out_idx, out_valid = state
        masked = jnp.where(active, scores, -jnp.inf)
        j = jnp.argmax(masked)
        valid = masked[j] > -jnp.inf
        out_boxes = out_boxes.at[i].set(boxes[j])
        out_scores = out_scores.at[i].set(jnp.where(valid, scores[j], 0.0))
        out_idx = out_idx.at[i].set(jnp.where(valid, j, -1).astype(jnp.int32))
        out_valid = out_valid.at[i].set(valid)
        iou = iou_one_to_many(boxes[j], boxes)
        # Remove the selected box and everything it suppresses.
        suppress = (iou > iou_threshold) | (
            jnp.arange(n) == j
        )
        active = active & ~suppress & valid
        return i + 1, active, out_boxes, out_scores, out_idx, out_valid

    def cond(state):
        i, active, *_ = state
        return (i < max_out) & jnp.any(active)

    init = (
        jnp.array(0, jnp.int32),
        active,
        jnp.zeros((max_out, 4), jnp.float32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.full((max_out,), -1, jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, _, out_boxes, out_scores, out_idx, out_valid = jax.lax.while_loop(
        cond, body, init
    )
    return NMSResult(out_boxes, out_scores, out_idx, out_valid)


def topk_select(
    boxes: jnp.ndarray, scores: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-NMS top-k by score over (..., N, 4)/(..., N) -> (..., k, 4)/(..., k).

    One multi-operand stable sort carries the four box columns along with
    the (negated) score key, replacing lax.top_k + a k-row gather: TPU
    row-gathers are element-serial, and the gather dominated the
    postprocess bucket at batch 128.  For finite scores, selection and
    order are identical to top_k (both stable: ties keep ascending
    original index).  NaN scores differ: top_k surfaces NaN first, the
    ascending sort of -scores places NaN last — callers must sanitize
    NaN upstream (filter_and_topk does: sub-threshold scores become 0).
    """
    k = min(k, scores.shape[-1])
    ops = (-scores,) + tuple(boxes[..., i] for i in range(4))
    neg_s, x1, y1, x2, y2 = jax.lax.sort(ops, num_keys=1)
    top_boxes = jnp.stack(
        [x1[..., :k], y1[..., :k], x2[..., :k], y2[..., :k]], axis=-1
    )
    return top_boxes, -neg_s[..., :k]


def rank_to_result(
    rank: jnp.ndarray,
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
) -> NMSResult:
    """Selection ranks (..., N) (-1 = dropped, r = r-th kept) -> ordered
    fixed-shape NMSResult (..., max_out, ...).

    Shared tail of the Pallas NMS wrappers.  One multi-operand stable
    sort on the rank key carries box columns, scores, and an index iota,
    replacing top_k + row-gathers (element-serial on TPU).  Unselected
    entries sort after all selected ones (key = max_out, stable by
    original index — the same order top_k gave their zero keys).
    """
    n = rank.shape[-1]
    key = jnp.where(rank >= 0, rank, max_out)
    iota = jnp.broadcast_to(
        jax.lax.iota(jnp.int32, n), rank.shape
    )
    ops = (
        key,
        boxes[..., 0].astype(jnp.float32),
        boxes[..., 1].astype(jnp.float32),
        boxes[..., 2].astype(jnp.float32),
        boxes[..., 3].astype(jnp.float32),
        scores.astype(jnp.float32),
        iota,
    )
    key_s, x1, y1, x2, y2, sc, idx = jax.lax.sort(ops, num_keys=1)
    k_top = min(max_out, n)

    def cut(a):
        a = a[..., :k_top]
        if k_top < max_out:
            pad = [(0, 0)] * (a.ndim - 1) + [(0, max_out - k_top)]
            a = jnp.pad(a, pad)
        return a

    valid = cut(key_s < max_out)
    out_boxes = jnp.stack([cut(x1), cut(y1), cut(x2), cut(y2)], axis=-1)
    return NMSResult(
        boxes=jnp.where(valid[..., None], out_boxes, 0.0),
        scores=jnp.where(valid, cut(sc), 0.0),
        indices=jnp.where(valid, cut(idx), -1).astype(jnp.int32),
        valid=valid,
    )
