"""Pallas TPU kernel for bbox-vote fusion (SURVEY.md §2 'bbox-vote fusion';
north star: "on-device bbox-vote NMS fusion").

Same VMEM-resident vector-only design as dan_tpu.ops.nms_pallas: per
iteration, pick the max-score remaining det, merge everything with
IoU >= threshold as a score-weighted average, emit, deactivate.  Because
the fused box is a NEW box (not one of the inputs), outputs can't be
reconstructed from a rank vector; instead the kernel accumulates fused
boxes into per-row output VECTORS using a one-hot output-slot mask
(out[:, i] written via `where(slot == i, value, out)`), keeping every store
full-row.

Parity with dan_tpu.ops.bbox_vote (and the numpy oracle) is exercised in
tests/unit/test_bbox_vote_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dan_tpu.ops.bbox_vote import VoteResult

_LANE = 128


def _vote_kernel(
    boxes_ref,  # (4, N) VMEM
    scores_ref,  # (1, N) VMEM
    valid_ref,  # (1, N) VMEM i32
    out_boxes_ref,  # (4, M) VMEM
    out_scores_ref,  # (1, M) VMEM
    out_valid_ref,  # (1, M) VMEM i32
    active_ref,  # (1, N) VMEM f32 scratch
    *,
    max_out: int,
    iou_threshold: float,
):
    n = scores_ref.shape[1]
    m = out_scores_ref.shape[1]
    scores = scores_ref[0, :]
    active_ref[0, :] = (
        (valid_ref[0, :] > 0) & (scores > 0.0)
    ).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0, :]
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    out_boxes_ref[:, :] = jnp.zeros((4, m), jnp.float32)
    out_scores_ref[0, :] = jnp.zeros((m,), jnp.float32)
    out_valid_ref[0, :] = jnp.zeros((m,), jnp.int32)

    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def body(i, _):
        act = active_ref[0, :]
        masked = jnp.where(act > 0.0, scores, -jnp.inf)
        best = jnp.max(masked)
        valid = best > -jnp.inf
        j = jnp.min(jnp.where(masked == best, col, n))
        sel = (col == j) & valid
        sel_f = sel.astype(jnp.float32)
        bx1 = jnp.sum(x1 * sel_f)
        by1 = jnp.sum(y1 * sel_f)
        bx2 = jnp.sum(x2 * sel_f)
        by2 = jnp.sum(y2 * sel_f)
        barea = jnp.sum(areas * sel_f)

        ix1 = jnp.maximum(bx1, x1)
        iy1 = jnp.maximum(by1, y1)
        ix2 = jnp.minimum(bx2, x2)
        iy2 = jnp.minimum(by2, y2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = barea + areas - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)
        merge = ((act > 0.0) & (iou >= iou_threshold)) | sel

        w = jnp.where(merge, scores, 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        fx1 = jnp.sum(x1 * w) / wsum
        fy1 = jnp.sum(y1 * w) / wsum
        fx2 = jnp.sum(x2 * w) / wsum
        fy2 = jnp.sum(y2 * w) / wsum
        fscore = best

        slot = (out_col[0, :] == i) & valid  # (m,)
        slot_f = slot.astype(jnp.float32)
        out_boxes_ref[0, :] = out_boxes_ref[0, :] + fx1 * slot_f
        out_boxes_ref[1, :] = out_boxes_ref[1, :] + fy1 * slot_f
        out_boxes_ref[2, :] = out_boxes_ref[2, :] + fx2 * slot_f
        out_boxes_ref[3, :] = out_boxes_ref[3, :] + fy2 * slot_f
        out_scores_ref[0, :] = out_scores_ref[0, :] + fscore * slot_f
        out_valid_ref[0, :] = out_valid_ref[0, :] + slot.astype(jnp.int32)

        active_ref[0, :] = jnp.where(merge, 0.0, act)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_out", "interpret")
)
def bbox_vote_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    in_valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    interpret: bool = False,
) -> VoteResult:
    """Drop-in replacement for dan_tpu.ops.bbox_vote.bbox_vote."""
    n = boxes.shape[0]
    n_pad = -(-max(n, _LANE) // _LANE) * _LANE
    m_pad = -(-max(max_out, _LANE) // _LANE) * _LANE
    boxes_t = jnp.zeros((4, n_pad), jnp.float32)
    boxes_t = boxes_t.at[:, :n].set(boxes.T.astype(jnp.float32))
    scores_p = jnp.zeros((1, n_pad), jnp.float32)
    scores_p = scores_p.at[0, :n].set(scores.astype(jnp.float32))
    valid_p = jnp.zeros((1, n_pad), jnp.int32)
    valid_p = valid_p.at[0, :n].set(in_valid.astype(jnp.int32))

    kernel = functools.partial(
        _vote_kernel, max_out=max_out, iou_threshold=iou_threshold
    )
    out_boxes, out_scores, out_valid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores_p, valid_p)

    return VoteResult(
        boxes=out_boxes.T[:max_out],
        scores=out_scores[0, :max_out],
        valid=out_valid[0, :max_out] > 0,
    )
