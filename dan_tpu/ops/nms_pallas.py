"""Pallas TPU kernel for greedy NMS (SURVEY.md §2 'NMS + score filter';
north star: "box decode + NMS run entirely on TPU HBM as Pallas kernels").

The XLA lax.while_loop version (dan_tpu.ops.nms.greedy_nms) round-trips the
active mask and outputs through HBM each iteration; this kernel keeps
boxes/scores/active entirely in VMEM across the whole greedy loop (~5000
boxes is ~100 KB, far under the ~16 MB budget).

Mosaic TPU constraints shape the design (no scalar loads/stores on VMEM):
everything is expressed as full-row vector ops on a (1, N) layout —
argmax via max+where+min-index, 'gather' of the selected box via masked
reductions, and the output is a per-box selection RANK vector (-1 = not
selected, k = k-th box kept).  The thin XLA wrapper turns ranks into the
ordered fixed-shape NMSResult via one top_k.

Semantics are identical to the XLA/numpy versions (score-descending greedy,
IoU-strictly-greater suppression, ties by lower index), verified in
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


def _nms_kernel(
    boxes_ref,  # (4, N) VMEM: rows x1, y1, x2, y2
    scores_ref,  # (1, N) VMEM
    rank_ref,  # (1, N) VMEM i32 out: selection order, -1 if dropped
    active_ref,  # (1, N) VMEM f32 scratch: 1.0 active / 0.0 suppressed
    *,
    max_out: int,
    iou_threshold: float,
    score_threshold: float,
):
    n = scores_ref.shape[1]
    scores = scores_ref[0, :]
    active_ref[0, :] = (scores > score_threshold).astype(jnp.float32)
    rank_ref[0, :] = jnp.full((n,), -1, jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0, :]

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
        # argmax with lowest-index tie-break.
        j = jnp.min(jnp.where(masked == best, col, n))
        sel = (col == j) & valid
        sel_f = sel.astype(jnp.float32)
        # 'Gather' of box j as masked reductions (vector-only).
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
        suppress = (iou > iou_threshold) | sel

        rank_ref[0, :] = jnp.where(sel, i, rank_ref[0, :])
        active_ref[0, :] = jnp.where(valid & suppress, 0.0, act)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_out", "score_threshold", "interpret")
)
def greedy_nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    score_threshold: float = 0.0,
    interpret: bool = False,
) -> NMSResult:
    """Drop-in replacement for dan_tpu.ops.nms.greedy_nms.

    boxes (N, 4) f32, scores (N,) f32 -> NMSResult with (max_out, ...).
    Set interpret=True on CPU (tests).
    """
    n = boxes.shape[0]
    n_pad = -(-max(n, _LANE) // _LANE) * _LANE
    boxes_t = jnp.zeros((4, n_pad), jnp.float32)
    boxes_t = boxes_t.at[:, :n].set(boxes.T.astype(jnp.float32))
    scores_p = jnp.full((1, n_pad), -jnp.inf, jnp.float32)
    scores_p = scores_p.at[0, :n].set(scores.astype(jnp.float32))

    kernel = functools.partial(
        _nms_kernel,
        max_out=max_out,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    rank = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores_p)[0]

    # rank -> ordered fixed-shape outputs via the shared multi-operand
    # sort (no gathers — see ops.nms.rank_to_result).  Operate on the
    # padded columns (pad ranks are -1, never selected, and their iota
    # indices can never become valid).
    return rank_to_result(
        rank, boxes_t.T.reshape(n_pad, 4), scores_p[0], max_out
    )
