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
        # Guard the exhausted case: best = -inf and slot_f = 0 would give
        # -inf * 0 = NaN, poisoning the whole accumulated output row.  XLA
        # happens to fold the multiply to 0 today, but that is a simplifier
        # artifact, not a guarantee.
        fscore = jnp.where(valid, best, 0.0)

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


_SUB = 8  # f32 sublane count: pad the batch dim to it


def _vote_kernel_batched(
    x1_ref,  # (B, N) VMEM
    y1_ref,
    x2_ref,
    y2_ref,
    scores_ref,  # (B, N) VMEM
    valid_ref,  # (B, N) VMEM i32
    ox1_ref,  # (B, M) VMEM out
    oy1_ref,
    ox2_ref,
    oy2_ref,
    oscores_ref,  # (B, M) VMEM out
    ovalid_ref,  # (B, M) VMEM i32 out
    active_ref,  # (B, N) VMEM f32 scratch
    *,
    max_out: int,
    iou_threshold: float,
):
    """Lockstep batched bbox-vote: every op is (B, N) or (B, 1), so the
    serial depth stays max_out regardless of batch size (the same design
    as nms_batched_pallas._kernel; vote additionally accumulates FUSED
    boxes — new coordinates, not a rank permutation — into (B, M) output
    slabs via one-hot slot masks)."""
    b, n = scores_ref.shape
    m = oscores_ref.shape[1]
    scores = scores_ref[:, :]
    active_ref[:, :] = (
        (valid_ref[:, :] > 0) & (scores > 0.0)
    ).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    ox1_ref[:, :] = jnp.zeros((b, m), jnp.float32)
    oy1_ref[:, :] = jnp.zeros((b, m), jnp.float32)
    ox2_ref[:, :] = jnp.zeros((b, m), jnp.float32)
    oy2_ref[:, :] = jnp.zeros((b, m), jnp.float32)
    oscores_ref[:, :] = jnp.zeros((b, m), jnp.float32)
    ovalid_ref[:, :] = jnp.zeros((b, m), jnp.int32)

    x1 = x1_ref[:, :]
    y1 = y1_ref[:, :]
    x2 = x2_ref[:, :]
    y2 = y2_ref[:, :]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def body(i, _):
        act = active_ref[:, :]
        masked = jnp.where(act > 0.0, scores, -jnp.inf)
        best = jnp.max(masked, axis=1, keepdims=True)  # (B, 1)
        row_valid = best > -jnp.inf  # (B, 1)
        j = jnp.min(
            jnp.where(masked == best, col, n), axis=1, keepdims=True
        )
        sel = (col == j) & row_valid  # (B, N)
        sel_f = sel.astype(jnp.float32)
        bx1 = jnp.sum(x1 * sel_f, axis=1, keepdims=True)  # (B, 1)
        by1 = jnp.sum(y1 * sel_f, axis=1, keepdims=True)
        bx2 = jnp.sum(x2 * sel_f, axis=1, keepdims=True)
        by2 = jnp.sum(y2 * sel_f, axis=1, keepdims=True)
        barea = jnp.sum(areas * sel_f, axis=1, keepdims=True)

        ix1 = jnp.maximum(bx1, x1)
        iy1 = jnp.maximum(by1, y1)
        ix2 = jnp.minimum(bx2, x2)
        iy2 = jnp.minimum(by2, y2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = barea + areas - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)
        merge = ((act > 0.0) & (iou >= iou_threshold)) | sel  # (B, N)

        w = jnp.where(merge, scores, 0.0)
        wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        fx1 = jnp.sum(x1 * w, axis=1, keepdims=True) / wsum  # (B, 1)
        fy1 = jnp.sum(y1 * w, axis=1, keepdims=True) / wsum
        fx2 = jnp.sum(x2 * w, axis=1, keepdims=True) / wsum
        fy2 = jnp.sum(y2 * w, axis=1, keepdims=True) / wsum
        # -inf guard (exhausted rows): see _vote_kernel.
        fscore = jnp.where(row_valid, best, 0.0)  # (B, 1)

        slot = (out_col == i) & row_valid  # (B, M)
        slot_f = slot.astype(jnp.float32)
        ox1_ref[:, :] = ox1_ref[:, :] + fx1 * slot_f
        oy1_ref[:, :] = oy1_ref[:, :] + fy1 * slot_f
        ox2_ref[:, :] = ox2_ref[:, :] + fx2 * slot_f
        oy2_ref[:, :] = oy2_ref[:, :] + fy2 * slot_f
        oscores_ref[:, :] = oscores_ref[:, :] + fscore * slot_f
        ovalid_ref[:, :] = ovalid_ref[:, :] + slot.astype(jnp.int32)

        active_ref[:, :] = jnp.where(merge, 0.0, act)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_out", "interpret")
)
def bbox_vote_pallas_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    in_valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    interpret: bool = False,
) -> VoteResult:
    """Batched bbox-vote: (B, N, 4)/(B, N)/(B, N) -> VoteResult with
    (B, max_out, ...) leaves.  Drop-in batched twin of bbox_vote_batched
    (XLA) — parity-tested in tests/unit/test_bbox_vote_pallas.py."""
    bsz, n = scores.shape
    n_pad = -(-max(n, _LANE) // _LANE) * _LANE
    m_pad = -(-max(max_out, _LANE) // _LANE) * _LANE
    # VMEM cap: Mosaic DOUBLE-BUFFERS the in/out pipeline windows across
    # grid steps, so the scoped budget per batch-slab row is
    # 2*(6 input + 6 output slabs) + the single-buffered scratch.  The
    # original single-buffered estimate OOM'd scoped VMEM (17.8 MB > 16)
    # at vote_batch=128 with N=6016 — caught by the r4 dataset-scale TTA
    # sweep; fixture-scale tests (vote_batch <= 32, one grid step) never
    # tripped it.
    row_bytes = 4 * (2 * (6 * n_pad + 6 * m_pad) + n_pad)
    budget_rows = (12 << 20) // row_bytes // _SUB * _SUB
    if budget_rows < _SUB:
        raise ValueError(
            f"bbox_vote_pallas_batched: n_pad={n_pad} needs "
            f"{row_bytes * _SUB / 2**20:.1f} MB VMEM per minimal slab; "
            "use ops.bbox_vote.bbox_vote_batched (XLA) for this size"
        )
    b_chunk = min(64, budget_rows)
    b_pad = -(-bsz // _SUB) * _SUB
    if b_pad > b_chunk:
        b_pad = -(-b_pad // b_chunk) * b_chunk
    else:
        b_chunk = b_pad

    def pad(x, fill):
        out = jnp.full((b_pad, n_pad), fill, jnp.float32)
        return out.at[:bsz, :n].set(x.astype(jnp.float32))

    x1 = pad(boxes[..., 0], 0.0)
    y1 = pad(boxes[..., 1], 0.0)
    x2 = pad(boxes[..., 2], 0.0)
    y2 = pad(boxes[..., 3], 0.0)
    sc = pad(scores, 0.0)
    va = jnp.zeros((b_pad, n_pad), jnp.int32)
    va = va.at[:bsz, :n].set(in_valid.astype(jnp.int32))

    kernel = functools.partial(
        _vote_kernel_batched, max_out=max_out, iou_threshold=iou_threshold
    )
    in_spec = pl.BlockSpec((b_chunk, n_pad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b_chunk, m_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b_pad // b_chunk,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b_pad, m_pad), jnp.float32)] * 5
            + [jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32)]
        ),
        in_specs=[in_spec] * 6,
        out_specs=tuple([out_spec] * 6),
        scratch_shapes=[pltpu.VMEM((b_chunk, n_pad), jnp.float32)],
        interpret=interpret,
    )(x1, y1, x2, y2, sc, va)
    ox1, oy1, ox2, oy2, osc, ova = outs
    out_boxes = jnp.stack(
        [ox1[:bsz, :max_out], oy1[:bsz, :max_out],
         ox2[:bsz, :max_out], oy2[:bsz, :max_out]], axis=-1
    )
    return VoteResult(
        boxes=out_boxes,
        scores=osc[:bsz, :max_out],
        valid=ova[:bsz, :max_out] > 0,
    )
