"""Pallas TPU kernels for anchor matching (SURVEY.md §2 'Matching +
encoding'; north star: "jaccard-overlap matching/encoding ... as Pallas
kernels").

The XLA reference implementation (dan_tpu.box.matching.match_anchors)
materializes the (A, G) IoU matrix in HBM several times (raw matrix, forced
one-hots, comp boosts, augmented argmax).  These kernels stream (TILE_A, G)
IoU tiles through VMEM in two grid passes and never materialize (A, G):

  pass 1 (per-gt stats, accumulated across tiles in VMEM outputs):
    - gt_best_iou / gt_best_anchor  (forced matching)
    - gt_count: #anchors whose raw best gt is g with IoU >= threshold
    - gt_kth: k-th largest IoU per gt (running top-k merge, k static)
    - anchor raw best IoU (ignore band) + raw best gt
  pass 2 (per-anchor final assignment, given the per-gt scalars):
    - augmented best: aug = iou + 2*forced + comp_boost, argmax over G
      with lowest-index tie-break — identical to the XLA semantics.

Everything is rank-2 (Mosaic layout inference requires it), vector-only.

Scale compensation reproduces lax.top_k's index tie-break exactly: the
running per-gt top-k is maintained under the lexicographic order
(value desc, anchor index asc) — exact IoU ties are common on a regular
anchor grid, so value-only selection would diverge from the XLA reference.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dan_tpu.box.anchors import center_to_corner
from dan_tpu.box.matching import MatchTargets, encode_boxes
from dan_tpu.config import AnchorConfig, MatchConfig

_TILE_A = 512
_BIG = 1e9
_BIG_I = 2**30  # plain ints: jnp constants would be captured consts in kernels


def _iou_tile(anchors_ref, gt_ref, start, n_gt):
    """(TILE_A, G) IoU tile from corner refs (4, A) and (4, G)."""
    ax1 = anchors_ref[0:1, pl.ds(start, _TILE_A)].reshape(_TILE_A, 1)
    ay1 = anchors_ref[1:2, pl.ds(start, _TILE_A)].reshape(_TILE_A, 1)
    ax2 = anchors_ref[2:3, pl.ds(start, _TILE_A)].reshape(_TILE_A, 1)
    ay2 = anchors_ref[3:4, pl.ds(start, _TILE_A)].reshape(_TILE_A, 1)
    gx1 = gt_ref[0:1, :]
    gy1 = gt_ref[1:2, :]
    gx2 = gt_ref[2:3, :]
    gy2 = gt_ref[3:4, :]
    a_area = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    g_area = jnp.maximum(gx2 - gx1, 0.0) * jnp.maximum(gy2 - gy1, 0.0)
    ix1 = jnp.maximum(ax1, gx1)
    iy1 = jnp.maximum(ay1, gy1)
    ix2 = jnp.minimum(ax2, gx2)
    iy2 = jnp.minimum(ay2, gy2)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = a_area + g_area - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def _stats_kernel(
    anchors_ref,  # (4, A) corner VMEM
    gt_ref,  # (4, G) corner VMEM
    mask_ref,  # (1, G) f32 VMEM
    best_iou_ref,  # (1, A) out: per-anchor raw best IoU
    best_gt_ref,  # (1, A) i32 out: per-anchor raw best gt
    gt_best_iou_ref,  # (1, G) out
    gt_best_anchor_ref,  # (1, G) i32 out
    gt_count_ref,  # (1, G) out f32
    gt_kth_ref,  # (1, G) out: k-th largest IoU per gt (order boundary)
    gt_kth_idx_ref,  # (1, G) i32 out: anchor index at the boundary
    topk_ref,  # (KPAD, G) VMEM scratch: running top-k values
    topi_ref,  # (KPAD, G) i32 VMEM scratch: running top-k anchor indices
    *,
    match_threshold: float,
    k: int,
    kpad: int,
):
    b = pl.program_id(0)
    start = b * _TILE_A
    n_gt = gt_ref.shape[1]
    valid = mask_ref[0:1, :]  # (1, G)

    @pl.when(b == 0)
    def _():
        gt_best_iou_ref[0:1, :] = jnp.full((1, n_gt), -1.0, jnp.float32)
        gt_best_anchor_ref[0:1, :] = jnp.zeros((1, n_gt), jnp.int32)
        gt_count_ref[0:1, :] = jnp.zeros((1, n_gt), jnp.float32)
        topk_ref[:, :] = jnp.full((kpad, n_gt), -1.0, jnp.float32)
        topi_ref[:, :] = jnp.full((kpad, n_gt), _BIG_I, jnp.int32)

    iou = _iou_tile(anchors_ref, gt_ref, start, n_gt) * valid  # (TILE_A, G)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (_TILE_A, n_gt), 1)
    row_a = jax.lax.broadcasted_iota(jnp.int32, (_TILE_A, n_gt), 0)

    # -- per-anchor raw best over G --
    a_best = jnp.max(iou, axis=1, keepdims=True)  # (TILE_A, 1)
    a_arg = jnp.min(
        jnp.where(iou == a_best, col_g, n_gt), axis=1, keepdims=True
    )  # (TILE_A, 1), ties -> lowest gt
    best_iou_ref[0:1, pl.ds(start, _TILE_A)] = a_best.reshape(1, _TILE_A)
    best_gt_ref[0:1, pl.ds(start, _TILE_A)] = a_arg.astype(jnp.int32).reshape(
        1, _TILE_A
    )

    # -- per-gt running max over A (forced matching) --
    g_tile_max = jnp.max(iou, axis=0, keepdims=True)  # (1, G)
    g_tile_arg = jnp.min(
        jnp.where(iou == g_tile_max, row_a, _TILE_A), axis=0, keepdims=True
    ) + start  # (1, G) global anchor index
    prev = gt_best_iou_ref[0:1, :]
    better = g_tile_max > prev  # strictly: earlier tile wins ties (lower idx)
    gt_best_iou_ref[0:1, :] = jnp.where(better, g_tile_max, prev)
    gt_best_anchor_ref[0:1, :] = jnp.where(
        better, g_tile_arg.astype(jnp.int32), gt_best_anchor_ref[0:1, :]
    )

    # -- per-gt count of threshold-matched anchors (raw rule) --
    pos = (a_best >= match_threshold) & (a_best > 0.0)  # (TILE_A, 1)
    is_best = col_g == a_arg  # one-hot of per-anchor argmax
    contrib = jnp.sum(
        jnp.where(is_best & pos, 1.0, 0.0), axis=0, keepdims=True
    )  # (1, G)
    gt_count_ref[0:1, :] = gt_count_ref[0:1, :] + contrib

    # -- per-gt running top-k merge under (value desc, index asc) order --
    # Exact IoU ties across anchors are COMMON (regular grid vs axis-
    # aligned boxes), so selection must tie-break by anchor index exactly
    # like lax.top_k in the XLA reference.  The running set is (vals, idxs)
    # pairs; 'min' / 'max' are lexicographic.
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, n_gt), 0)

    def extract_merge(t, iou_work):
        # Tile max under the order: max value, ties -> lowest local row.
        m = jnp.max(iou_work, axis=0, keepdims=True)  # (1, G)
        first = jnp.min(
            jnp.where(iou_work == m, row_a, _TILE_A), axis=0, keepdims=True
        )
        iou_work = jnp.where(row_a == first, -1.0, iou_work)
        m_idx = first + start  # (1, G) global anchor index

        vals = topk_ref[:, :]
        idxs = topi_ref[:, :]
        # Running min under the order: lowest value, ties -> HIGHEST index.
        vmin = jnp.min(vals, axis=0, keepdims=True)
        imax_at_vmin = jnp.max(
            jnp.where(vals == vmin, idxs, -1), axis=0, keepdims=True
        )
        slot = jnp.min(
            jnp.where((vals == vmin) & (idxs == imax_at_vmin), rows_k, kpad),
            axis=0,
            keepdims=True,
        )
        beats = (m > vmin) | ((m == vmin) & (m_idx < imax_at_vmin))
        write = (rows_k == slot) & beats
        topk_ref[:, :] = jnp.where(write, jnp.broadcast_to(m, (kpad, n_gt)), vals)
        topi_ref[:, :] = jnp.where(
            write, jnp.broadcast_to(m_idx, (kpad, n_gt)), idxs
        )
        return iou_work

    jax.lax.fori_loop(0, k, extract_merge, iou, unroll=True)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        # The k-th element under the order: pop the max k-1 times, then the
        # remaining max (value, index) is the selection boundary.
        vals = topk_ref[:, :]
        idxs = topi_ref[:, :]
        for _ in range(k - 1):
            m = jnp.max(vals, axis=0, keepdims=True)
            mi = jnp.min(
                jnp.where(vals == m, idxs, _BIG_I), axis=0, keepdims=True
            )
            hit = (vals == m) & (idxs == mi)
            vals = jnp.where(hit, -1.0, vals)
            idxs = jnp.where(hit, _BIG_I, idxs)
        kth_v = jnp.max(vals, axis=0, keepdims=True)
        kth_i = jnp.min(
            jnp.where(vals == kth_v, idxs, _BIG_I), axis=0, keepdims=True
        )
        gt_kth_ref[0:1, :] = kth_v
        gt_kth_idx_ref[0:1, :] = kth_i


def _assign_kernel(
    anchors_ref,  # (4, A)
    gt_ref,  # (4, G)
    mask_ref,  # (1, G)
    coords_ref,  # (G, 128) f32: lanes 0..3 = matched-gt (cx, cy, w, h)
    gt_best_anchor_ref,  # (1, G) i32 (from pass 1)
    gt_needs_ref,  # (1, G) f32: 1.0 if scale comp applies
    gt_kth_ref,  # (1, G)
    gt_kth_idx_ref,  # (1, G) i32
    matched_gt_ref,  # (1, A) i32 out
    matched_aug_ref,  # (1, A) out: augmented best value
    matched_cx_ref,  # (1, A) out: matched gt center x
    matched_cy_ref,  # (1, A) out
    matched_w_ref,  # (1, A) out
    matched_h_ref,  # (1, A) out
    *,
    scale_comp_iou: float,
):
    b = pl.program_id(0)
    start = b * _TILE_A
    n_gt = gt_ref.shape[1]
    valid = mask_ref[0:1, :]
    iou = _iou_tile(anchors_ref, gt_ref, start, n_gt) * valid
    col_g = jax.lax.broadcasted_iota(jnp.int32, (_TILE_A, n_gt), 1)
    row_a = (
        jax.lax.broadcasted_iota(jnp.int32, (_TILE_A, n_gt), 0) + start
    )

    forced = (row_a == gt_best_anchor_ref[0:1, :]) & (valid > 0.0)
    kth_v = gt_kth_ref[0:1, :]
    kth_i = gt_kth_idx_ref[0:1, :]
    in_topk = (iou > kth_v) | ((iou == kth_v) & (row_a <= kth_i))
    comp = (
        (gt_needs_ref[0:1, :] > 0.0) & in_topk & (iou > scale_comp_iou)
    )
    aug = iou + 2.0 * forced.astype(jnp.float32) + jnp.minimum(
        comp.astype(jnp.float32), 1.0
    )
    best = jnp.max(aug, axis=1, keepdims=True)  # (TILE_A, 1)
    arg = jnp.min(
        jnp.where(aug == best, col_g, n_gt), axis=1, keepdims=True
    )
    matched_aug_ref[0:1, pl.ds(start, _TILE_A)] = best.reshape(1, _TILE_A)
    matched_gt_ref[0:1, pl.ds(start, _TILE_A)] = (
        arg.astype(jnp.int32).reshape(1, _TILE_A)
    )

    # Matched gt coordinates selected in-kernel via ONE MXU matmul of the
    # one-hot argmax mask against the precomputed (G, 128) coord matrix —
    # this replaced (i) a (A, 4) HBM gather (1.2 ms/step at batch 8; TPU
    # gathers are element-serial) and (ii) 4 masked VPU reduces over the
    # tile (~1 ms/step at batch 16).  Values stay bit-identical: each row
    # of sel has exactly one 1.0, so every f32 partial-sum term is either
    # +0.0 or the exact coordinate (Precision.HIGHEST keeps the bf16x
    # decomposition's hi/mid/lo splits exactly recombinable; x+0 == x).
    sel = col_g == arg  # exactly one true per row (arg is the tie-broken min)
    picked = jax.lax.dot_general(
        sel.astype(jnp.float32),
        coords_ref[:, :],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (TILE_A, 128): lanes 0..3 = cx, cy, w, h
    for i, ref in enumerate(
        (matched_cx_ref, matched_cy_ref, matched_w_ref, matched_h_ref)
    ):
        ref[0:1, pl.ds(start, _TILE_A)] = picked[:, i : i + 1].reshape(
            1, _TILE_A
        )


@functools.partial(
    jax.jit,
    static_argnames=("match_config", "anchor_config", "interpret"),
)
def match_anchors_pallas(
    anchors_center: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    match_config: MatchConfig,
    anchor_config: AnchorConfig,
    interpret: bool = False,
) -> MatchTargets:
    """Drop-in replacement for dan_tpu.box.matching.match_anchors."""
    a = anchors_center.shape[0]
    g = gt_boxes.shape[0]
    a_pad = -(-a // _TILE_A) * _TILE_A
    g_pad = -(-max(g, 128) // 128) * 128

    anchors_corner = center_to_corner(anchors_center)
    anchors_t = jnp.zeros((4, a_pad), jnp.float32)
    anchors_t = anchors_t.at[:, :a].set(anchors_corner.T.astype(jnp.float32))
    gt_t = jnp.zeros((4, g_pad), jnp.float32)
    gt_t = gt_t.at[:, :g].set(gt_boxes.T.astype(jnp.float32))
    mask_p = jnp.zeros((1, g_pad), jnp.float32)
    mask_p = mask_p.at[0, :g].set(gt_mask.astype(jnp.float32))

    k = min(match_config.scale_comp_topk, a)
    kpad = max(8, k)  # tile-friendly sublane count; must be >= k
    grid = (a_pad // _TILE_A,)
    stats = pl.pallas_call(
        functools.partial(
            _stats_kernel,
            match_threshold=match_config.match_threshold,
            k=k,
            kpad=kpad,
        ),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),  # best_iou
            jax.ShapeDtypeStruct((1, a_pad), jnp.int32),  # best_gt
            jax.ShapeDtypeStruct((1, g_pad), jnp.float32),  # gt_best_iou
            jax.ShapeDtypeStruct((1, g_pad), jnp.int32),  # gt_best_anchor
            jax.ShapeDtypeStruct((1, g_pad), jnp.float32),  # gt_count
            jax.ShapeDtypeStruct((1, g_pad), jnp.float32),  # gt_kth
            jax.ShapeDtypeStruct((1, g_pad), jnp.int32),  # gt_kth_idx
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)),
        scratch_shapes=[
            pltpu.VMEM((kpad, g_pad), jnp.float32),
            pltpu.VMEM((kpad, g_pad), jnp.int32),
        ],
        interpret=interpret,
    )(anchors_t, gt_t, mask_p)
    (
        best_iou,
        best_gt,
        gt_best_iou,
        gt_best_anchor,
        gt_count,
        gt_kth,
        gt_kth_idx,
    ) = stats

    if match_config.enable_scale_comp:
        needs = (
            (gt_count[0] < k) & (mask_p[0] > 0.0)
        ).astype(jnp.float32)[None, :]
    else:
        needs = jnp.zeros((1, g_pad), jnp.float32)

    # (G, 128) matched-coordinate matrix for the in-kernel one-hot matmul:
    # lanes 0..3 = (cx, cy, w, h), same arithmetic as corner_to_center.
    coords = jnp.zeros((g_pad, 128), jnp.float32)
    coords = coords.at[:, 0].set((gt_t[0] + gt_t[2]) * 0.5)
    coords = coords.at[:, 1].set((gt_t[1] + gt_t[3]) * 0.5)
    coords = coords.at[:, 2].set(gt_t[2] - gt_t[0])
    coords = coords.at[:, 3].set(gt_t[3] - gt_t[1])

    matched_gt, matched_aug, m_cx, m_cy, m_w, m_h = pl.pallas_call(
        functools.partial(
            _assign_kernel, scale_comp_iou=match_config.scale_comp_iou
        ),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, a_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)
        ),
        interpret=interpret,
    )(
        anchors_t, gt_t, mask_p, coords,
        gt_best_anchor, needs, gt_kth, gt_kth_idx,
    )

    best_iou = best_iou[0, :a]
    matched_gt_a = jnp.minimum(matched_gt[0, :a], g - 1)
    matched_aug_a = matched_aug[0, :a]

    positive = matched_aug_a >= match_config.match_threshold
    ignore = (
        (best_iou >= match_config.ignore_threshold)
        & (best_iou < match_config.match_threshold)
        & ~positive
    )
    cls_target = jnp.where(positive, 1, jnp.where(ignore, -1, 0)).astype(
        jnp.int32
    )
    matched_center = jnp.stack(
        [m_cx[0, :a], m_cy[0, :a], m_w[0, :a], m_h[0, :a]], axis=-1
    )
    loc_target = encode_boxes(
        matched_center, anchors_center, anchor_config.prior_scaling
    )
    loc_target = jnp.where(positive[:, None], loc_target, 0.0)
    return MatchTargets(
        cls_target=cls_target,
        loc_target=loc_target,
        matched_gt=matched_gt_a.astype(jnp.int32),
        matched_iou=best_iou,
    )
