"""Natively-batched Pallas greedy NMS.

vmap of the per-image kernel (nms_pallas) serializes B independent greedy
loops: B x max_out sequential steps.  This kernel runs ALL images' loops in
lockstep — every op is a (B, N) or (B, 1) vector op (argmax via
row-max + min-index, 'gather' via masked row reductions), so the serial
depth stays max_out regardless of batch size.  At batch 16 / N=5120 this is
the difference between ~16x750 and 750 dependent steps.

Semantics identical to ops.nms.greedy_nms per row (score-descending greedy,
IoU-strictly-greater suppression, lowest-index ties); parity-tested in
tests/unit/test_nms_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dan_tpu.ops.nms import NMSResult, rank_to_result

_LANE = 128
_SUB = 8  # pad the batch dim to the f32 sublane count


def _kernel(
    x1_ref,  # (B, N) VMEM
    y1_ref,
    x2_ref,
    y2_ref,
    scores_ref,
    rank_ref,  # (B, N) i32 out: selection order per row, -1 if dropped
    active_ref,  # (B, N) f32 scratch
    *,
    max_out: int,
    iou_threshold: float,
    score_threshold: float,
):
    b, n = scores_ref.shape
    scores = scores_ref[:, :]
    active_ref[:, :] = (scores > score_threshold).astype(jnp.float32)
    rank_ref[:, :] = jnp.full((b, n), -1, jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)

    x1 = x1_ref[:, :]
    y1 = y1_ref[:, :]
    x2 = x2_ref[:, :]
    y2 = y2_ref[:, :]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def body(i, _):
        act = active_ref[:, :]
        masked = jnp.where(act > 0.0, scores, -jnp.inf)
        best = jnp.max(masked, axis=1, keepdims=True)  # (B, 1)
        valid = best > -jnp.inf
        j = jnp.min(
            jnp.where(masked == best, col, n), axis=1, keepdims=True
        )  # (B, 1): per-row argmax, lowest-index ties
        sel = (col == j) & valid  # (B, N)
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
        suppress = (iou > iou_threshold) | sel

        rank_ref[:, :] = jnp.where(sel, i, rank_ref[:, :])
        active_ref[:, :] = jnp.where(valid & suppress, 0.0, act)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "score_threshold", "interpret"),
)
def greedy_nms_pallas_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    score_threshold: float = 0.0,
    interpret: bool = False,
) -> NMSResult:
    """Batched greedy NMS: (B, N, 4) boxes + (B, N) scores -> NMSResult with
    (B, max_out, ...) leaves."""
    bsz, n = scores.shape
    n_pad = -(-max(n, _LANE) // _LANE) * _LANE
    # VMEM cap: the kernel holds 7 (Bc, N) f32/i32 buffers; chunk the batch
    # so a slab stays well under the ~16 MB scoped-VMEM limit (Bc=64 at
    # N=5120 is ~9.2 MB). Slabs run sequentially as grid steps; rows within
    # a slab stay in lockstep.
    budget_rows = (12 << 20) // (7 * 4 * n_pad) // _SUB * _SUB
    if budget_rows < _SUB:
        # Even an 8-row slab would blow scoped VMEM (N >~ 56k): this
        # kernel cannot run — fail loudly instead of compiling a kernel
        # the Mosaic VMEM checker will reject anyway. Callers should use
        # ops.nms.greedy_nms (XLA) for such N.
        raise ValueError(
            f"greedy_nms_pallas_batched: n_pad={n_pad} needs "
            f"{7 * 4 * n_pad * _SUB / 2**20:.1f} MB VMEM per minimal slab; "
            "use the XLA NMS for this size"
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
    sc = pad(scores, -jnp.inf)

    kernel = functools.partial(
        _kernel,
        max_out=max_out,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    spec = pl.BlockSpec((b_chunk, n_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rank = pl.pallas_call(
        kernel,
        grid=(b_pad // b_chunk,),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.int32),
        in_specs=[spec] * 5,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((b_chunk, n_pad), jnp.float32)],
        interpret=interpret,
    )(x1, y1, x2, y2, sc)[:bsz, :n]

    # rank -> ordered outputs per row via the shared multi-operand sort
    # (no per-row gathers — see ops.nms.rank_to_result).
    return rank_to_result(rank, boxes, scores, max_out)
