"""Blocked (bitmask) greedy NMS — the fast Pallas path.

Exact greedy-NMS semantics (identical kept set to dan_tpu.ops.nms.greedy_nms
and the numpy oracle) via the classic blocked formulation, exploiting that
the input is already score-sorted (lax.top_k upstream):

  for each 128-box block, in score order:
    1. intra-block serial resolution on a precomputed (B, B) IoU tile —
       each step is one (1,B)x(B,B) MXU row-extract + a few B-wide VPU ops,
       NO full-width argmax;
    2. one parallel (B, N) suppression sweep of the block's kept boxes
       over all later boxes.

Measured on v5e at N=5000/max_out=750: 2.35 ms single-call vs 3.73 ms for
the argmax-loop kernel (nms_pallas) and 10.7 ms for the XLA while_loop —
but SLOWER under vmap at batch 8 (11.0 vs 8.4 ms), so the argmax kernel
remains the dispatched default (ops.postprocess._run_nms); this kernel is
the better scaling path for large single-call N.  A box suppressed earlier
never suppresses later boxes (checked via the running `removed` mask),
which is exactly greedy.

Grid = one program per block; the `removed` mask lives in VMEM scratch
across sequential grid steps (TPU grids execute serially per core).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dan_tpu.ops.nms import NMSResult, rank_to_result

_B = 128  # block size (one lane row)


def _kernel(
    boxes_ref,  # (4, N) VMEM, score-descending
    scores_ref,  # (1, N) VMEM
    kept_ref,  # (1, N) VMEM f32 out: 1.0 kept / 0.0 suppressed
    removed_ref,  # (1, N) VMEM f32 scratch
    *,
    iou_threshold: float,
    score_threshold: float,
):
    b = pl.program_id(0)
    n = scores_ref.shape[1]
    start = b * _B

    # NOTE: every intermediate stays rank-2 — Mosaic's vector layout
    # inference aborts on rank-1 values mixed into 2-D elementwise ops.

    @pl.when(b == 0)
    def _():
        removed_ref[0:1, :] = (
            scores_ref[0:1, :] <= score_threshold
        ).astype(jnp.float32)

    # Block geometry from ref slices (values may not be dynamically sliced).
    bx1 = boxes_ref[0:1, pl.ds(start, _B)]  # (1, B)
    by1 = boxes_ref[1:2, pl.ds(start, _B)]
    bx2 = boxes_ref[2:3, pl.ds(start, _B)]
    by2 = boxes_ref[3:4, pl.ds(start, _B)]
    barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
    bx1c = bx1.reshape(_B, 1)  # (B, 1) column versions
    by1c = by1.reshape(_B, 1)
    bx2c = bx2.reshape(_B, 1)
    by2c = by2.reshape(_B, 1)
    bareac = barea.reshape(_B, 1)

    # (B, B) intra-block IoU tile.
    ix1 = jnp.maximum(bx1c, bx1)
    iy1 = jnp.maximum(by1c, by1)
    ix2 = jnp.minimum(bx2c, bx2)
    iy2 = jnp.minimum(by2c, by2)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = bareac + barea - inter
    iou_sq = jnp.where(union > 0.0, inter / union, 0.0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _B), 1)  # (1, B)

    def intra(i, removed_blk):  # removed_blk (1, B)
        sel = (row_ids == i).astype(jnp.float32)  # (1, B)
        alive_i = jnp.sum(removed_blk * sel) == 0.0
        # Row i of the IoU tile via a (1,B)x(B,B) MXU product.
        row = jnp.dot(sel, iou_sq, preferred_element_type=jnp.float32)  # (1, B)
        supp = (row > iou_threshold) & (row_ids > i) & alive_i
        return jnp.where(supp, 1.0, removed_blk)

    removed_blk = jax.lax.fori_loop(
        0, _B, intra, removed_ref[0:1, pl.ds(start, _B)]
    )
    removed_ref[0:1, pl.ds(start, _B)] = removed_blk
    kept_blk_c = (1.0 - removed_blk).reshape(_B, 1)  # (B, 1)

    # Parallel sweep: block's kept boxes suppress all later boxes.
    x1 = boxes_ref[0:1, :]  # (1, N)
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    jx1 = jnp.maximum(bx1c, x1)  # (B, N)
    jy1 = jnp.maximum(by1c, y1)
    jx2 = jnp.minimum(bx2c, x2)
    jy2 = jnp.minimum(by2c, y2)
    jinter = jnp.maximum(jx2 - jx1, 0.0) * jnp.maximum(jy2 - jy1, 0.0)
    junion = bareac + areas - jinter
    iou_bn = jnp.where(junion > 0.0, jinter / junion, 0.0)
    supp_any = jnp.max(
        jnp.where(iou_bn > iou_threshold, kept_blk_c, 0.0),
        axis=0,
        keepdims=True,
    )  # (1, N)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    later = (col_n >= start + _B).astype(jnp.float32)
    removed_ref[0:1, :] = jnp.maximum(removed_ref[0:1, :], supp_any * later)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        kept_ref[0:1, :] = 1.0 - removed_ref[0:1, :]


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "score_threshold", "interpret"),
)
def greedy_nms_blocked(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    score_threshold: float = 0.0,
    interpret: bool = False,
) -> NMSResult:
    """Drop-in greedy NMS; REQUIRES scores sorted descending (as produced by
    ops.nms.topk_select).  Returns the first max_out kept boxes."""
    n = boxes.shape[0]
    n_pad = -(-max(n, _B) // _B) * _B
    boxes_t = jnp.zeros((4, n_pad), jnp.float32)
    boxes_t = boxes_t.at[:, :n].set(boxes.T.astype(jnp.float32))
    scores_p = jnp.full((1, n_pad), -jnp.inf, jnp.float32)
    scores_p = scores_p.at[0, :n].set(scores.astype(jnp.float32))

    kernel = functools.partial(
        _kernel,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    kept = pl.pallas_call(
        kernel,
        grid=(n_pad // _B,),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores_p)[0]

    # First max_out kept (input is score-sorted, so index order = rank);
    # shared gather-free tail (ops.nms.rank_to_result on the padded cols).
    kept_bool = kept > 0.5
    order = jnp.cumsum(kept_bool.astype(jnp.int32)) - 1  # rank among kept
    rank = jnp.where(kept_bool, order, -1)
    return rank_to_result(rank, boxes_t.T, scores_p[0], max_out)
