"""Pallas TPU kernels for anchor matching (SURVEY.md §2 'Matching +
encoding'; north star: "jaccard-overlap matching/encoding ... as Pallas
kernels").

The XLA reference implementation (dan_tpu.box.matching.match_anchors)
materializes the (A, G) IoU matrix in HBM several times (raw matrix, forced
one-hots, comp boosts, augmented argmax).  These kernels stream transposed
(G, TILE_A) IoU tiles through VMEM in two grid passes and never materialize
(A, G):

  pass 1 (per-gt stats, accumulated across tiles in (G, 8)-packed VMEM
  outputs):
    - gt_best_iou / gt_best_anchor  (forced matching)
    - gt_count: #anchors whose raw best gt is g with IoU >= threshold
    - gt_kth / gt_kth_idx: the k-th largest IoU per gt + its anchor
      (running top-k merge, k static)
    - anchor raw best IoU (ignore band)
  pass 2 (per-anchor final assignment, given the per-gt columns):
    - augmented best: aug = iou + 2*forced + comp_boost, argmax over G
      with lowest-index tie-break — identical to the XLA semantics —
      plus matched-gt coordinates via one one-hot MXU matmul.

Everything is rank-2 (Mosaic layout inference requires it), vector-only.
ORIENTATION MATTERS: gt lives on SUBLANES and anchors on LANES, so every
per-anchor reduce lands as a (1, TILE_A) row that stores directly into
the (1, A) outputs.  The first (anchor-major) version spent most of its
runtime on (TILE_A, 1) -> (1, TILE_A) relayouts — per-quantity, per-tile
— plus four more per tile columnizing the anchors inside the IoU tile;
transposing the whole kernel deleted all of them (stats+assign
14.9 -> ~6 ms/step at batch 16, BASELINE.md r2).

Scale compensation reproduces lax.top_k's index tie-break exactly: the
running per-gt top-k is maintained under the lexicographic order
(value desc, anchor index asc) — exact IoU ties are common on a regular
anchor grid, so value-only selection would diverge from the XLA reference.
"""
from __future__ import annotations

import functools

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


def _iou_tile_t(anchors_ref, gtf_ref, start):
    """(G, TILE_A) transposed IoU tile: gt on SUBLANES, anchors on LANES.

    anchors_ref (4, A) corner rows -> (1, TILE_A) row slices broadcast
    over gt sublanes; gtf_ref (G, 8) packed per-gt columns (x1, y1, x2,
    y2, mask, ...) -> (G, 1) column slices.  Masked (iou * valid), like
    the XLA reference.  This orientation means every per-anchor reduce
    lands as a (1, TILE_A) ROW that stores straight into the (1, A)
    outputs; the anchor-major orientation needed a (TILE_A, 1) ->
    (1, TILE_A) relayout per quantity per tile plus 4 more to columnize
    the anchors, which dominated kernel runtime (BASELINE.md r2).
    """
    ax1 = anchors_ref[0:1, pl.ds(start, _TILE_A)]
    ay1 = anchors_ref[1:2, pl.ds(start, _TILE_A)]
    ax2 = anchors_ref[2:3, pl.ds(start, _TILE_A)]
    ay2 = anchors_ref[3:4, pl.ds(start, _TILE_A)]
    gx1 = gtf_ref[:, 0:1]
    gy1 = gtf_ref[:, 1:2]
    gx2 = gtf_ref[:, 2:3]
    gy2 = gtf_ref[:, 3:4]
    valid = gtf_ref[:, 4:5]
    a_area = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    g_area = jnp.maximum(gx2 - gx1, 0.0) * jnp.maximum(gy2 - gy1, 0.0)
    ix1 = jnp.maximum(ax1, gx1)
    iy1 = jnp.maximum(ay1, gy1)
    ix2 = jnp.minimum(ax2, gx2)
    iy2 = jnp.minimum(ay2, gy2)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = a_area + g_area - inter
    return jnp.where(union > 0.0, inter / union, 0.0) * valid


def _stats_kernel(
    anchors_ref,  # (4, A) corner rows, VMEM
    gtf_ref,  # (G, 8) f32: x1, y1, x2, y2, mask, 0, 0, 0
    best_iou_ref,  # (1, A) out: per-anchor raw best IoU
    gstat_f_ref,  # (G, 8) f32 out: [gt_best_iou, gt_count, gt_kth, 0...]
    gstat_i_ref,  # (G, 8) i32 out: [gt_best_anchor, gt_kth_idx, 0...]
    topk_ref,  # (G, KPAD) f32 scratch: running top-k values
    topi_ref,  # (G, KPAD) i32 scratch: running top-k anchor indices
    *,
    match_threshold: float,
    k: int,
    kpad: int,
):
    """Pass 1, transposed orientation (see _iou_tile_t): per-gt stats
    accumulate in the (G, 8)-packed outputs/scratch across anchor tiles;
    per-anchor best IoU stores as direct rows."""
    b = pl.program_id(0)
    start = b * _TILE_A
    n_gt = gtf_ref.shape[0]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (n_gt, 8), 1)

    @pl.when(b == 0)
    def _():
        # gt_best_iou lane starts at -1 (so a 0-IoU tile max still claims
        # the first tile's lowest anchor), everything else at 0.
        gstat_f_ref[:, :] = jnp.where(lane8 == 0, -1.0, 0.0)
        gstat_i_ref[:, :] = jnp.zeros((n_gt, 8), jnp.int32)
        topk_ref[:, :] = jnp.full((n_gt, kpad), -1.0, jnp.float32)
        topi_ref[:, :] = jnp.full((n_gt, kpad), _BIG_I, jnp.int32)

    iou = _iou_tile_t(anchors_ref, gtf_ref, start)  # (G, TILE_A)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (n_gt, _TILE_A), 0)
    col_a = jax.lax.broadcasted_iota(jnp.int32, (n_gt, _TILE_A), 1)

    # -- per-anchor raw best over G (sublane reduce -> direct row store) --
    a_best = jnp.max(iou, axis=0, keepdims=True)  # (1, T)
    a_arg = jnp.min(
        jnp.where(iou == a_best, row_g, n_gt), axis=0, keepdims=True
    )  # (1, T), ties -> lowest gt
    best_iou_ref[0:1, pl.ds(start, _TILE_A)] = a_best

    # -- per-gt running max over A (forced matching) --
    g_tile_max = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
    g_tile_arg = jnp.min(
        jnp.where(iou == g_tile_max, col_a, _TILE_A), axis=1, keepdims=True
    ) + start  # (G, 1) global anchor index
    prev = gstat_f_ref[:, 0:1]
    better = g_tile_max > prev  # strictly: earlier tile wins ties (lower idx)
    gstat_f_ref[:, 0:1] = jnp.where(better, g_tile_max, prev)
    gstat_i_ref[:, 0:1] = jnp.where(
        better, g_tile_arg.astype(jnp.int32), gstat_i_ref[:, 0:1]
    )

    # -- per-gt count of threshold-matched anchors (raw rule) --
    pos = (a_best >= match_threshold) & (a_best > 0.0)  # (1, T)
    is_best = row_g == a_arg  # one-hot of per-anchor argmax
    contrib = jnp.sum(
        jnp.where(is_best & pos, 1.0, 0.0), axis=1, keepdims=True
    )  # (G, 1)
    gstat_f_ref[:, 1:2] = gstat_f_ref[:, 1:2] + contrib

    # -- per-gt running top-k merge under (value desc, index asc) order --
    # Exact IoU ties across anchors are COMMON (regular grid vs axis-
    # aligned boxes), so selection must tie-break by anchor index exactly
    # like lax.top_k in the XLA reference.  The running set is (vals, idxs)
    # pairs; 'min' / 'max' are lexicographic.
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (n_gt, kpad), 1)

    def extract_merge(t, iou_work):
        # Tile max under the order: max value, ties -> lowest local col.
        m = jnp.max(iou_work, axis=1, keepdims=True)  # (G, 1)
        first = jnp.min(
            jnp.where(iou_work == m, col_a, _TILE_A), axis=1, keepdims=True
        )
        iou_work = jnp.where(col_a == first, -1.0, iou_work)
        m_idx = first + start  # (G, 1) global anchor index

        vals = topk_ref[:, :]
        idxs = topi_ref[:, :]
        # Running min under the order: lowest value, ties -> HIGHEST index.
        vmin = jnp.min(vals, axis=1, keepdims=True)
        imax_at_vmin = jnp.max(
            jnp.where(vals == vmin, idxs, -1), axis=1, keepdims=True
        )
        slot = jnp.min(
            jnp.where((vals == vmin) & (idxs == imax_at_vmin), cols_k, kpad),
            axis=1,
            keepdims=True,
        )
        beats = (m > vmin) | ((m == vmin) & (m_idx < imax_at_vmin))
        write = (cols_k == slot) & beats
        topk_ref[:, :] = jnp.where(write, jnp.broadcast_to(m, (n_gt, kpad)), vals)
        topi_ref[:, :] = jnp.where(
            write, jnp.broadcast_to(m_idx, (n_gt, kpad)), idxs
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
            m = jnp.max(vals, axis=1, keepdims=True)
            mi = jnp.min(
                jnp.where(vals == m, idxs, _BIG_I), axis=1, keepdims=True
            )
            hit = (vals == m) & (idxs == mi)
            vals = jnp.where(hit, -1.0, vals)
            idxs = jnp.where(hit, _BIG_I, idxs)
        kth_v = jnp.max(vals, axis=1, keepdims=True)
        kth_i = jnp.min(
            jnp.where(vals == kth_v, idxs, _BIG_I), axis=1, keepdims=True
        )
        gstat_f_ref[:, 2:3] = kth_v
        gstat_i_ref[:, 1:2] = kth_i


def _assign_kernel(
    anchors_ref,  # (4, A) corner rows
    gtf_ref,  # (G, 8) f32 columns: x1, y1, x2, y2, mask, needs, kth, 0
    gti_ref,  # (G, 8) i32 columns: gt_best_anchor, kth_idx, 0...
    coords_ref,  # (8, G) f32: rows 0..3 = matched-gt (cx, cy, w, h)
    matched_gt_ref,  # (1, A) i32 out
    matched_aug_ref,  # (1, A) out: augmented best value
    matched_cx_ref,  # (1, A) out: matched gt center x
    matched_cy_ref,  # (1, A) out
    matched_w_ref,  # (1, A) out
    matched_h_ref,  # (1, A) out
    *,
    scale_comp_iou: float,
):
    """Transposed orientation: gt on SUBLANES, anchors on LANES.

    Every per-anchor result then falls out of an axis-0 (sublane) reduce
    as a (1, TILE_A) ROW that stores directly into the (1, A) outputs —
    the original anchor-major layout needed a (TILE_A, 1) -> (1, TILE_A)
    relayout per quantity per tile (plus 4 more inside the IoU tile to
    columnize the anchors), which dominated the kernel's runtime.
    """
    b = pl.program_id(0)
    start = b * _TILE_A
    n_gt = gtf_ref.shape[0]
    valid = gtf_ref[:, 4:5]
    iou = _iou_tile_t(anchors_ref, gtf_ref, start)  # (G, TILE_A)

    row_g = jax.lax.broadcasted_iota(jnp.int32, (n_gt, _TILE_A), 0)
    col_a = (
        jax.lax.broadcasted_iota(jnp.int32, (n_gt, _TILE_A), 1) + start
    )

    forced = (col_a == gti_ref[:, 0:1]) & (valid > 0.0)
    kth_v = gtf_ref[:, 6:7]
    kth_i = gti_ref[:, 1:2]
    in_topk = (iou > kth_v) | ((iou == kth_v) & (col_a <= kth_i))
    comp = (gtf_ref[:, 5:6] > 0.0) & in_topk & (iou > scale_comp_iou)
    aug = iou + 2.0 * forced.astype(jnp.float32) + jnp.minimum(
        comp.astype(jnp.float32), 1.0
    )
    best = jnp.max(aug, axis=0, keepdims=True)  # (1, T) — direct row
    arg = jnp.min(
        jnp.where(aug == best, row_g, n_gt), axis=0, keepdims=True
    )
    matched_aug_ref[0:1, pl.ds(start, _TILE_A)] = best
    matched_gt_ref[0:1, pl.ds(start, _TILE_A)] = arg.astype(jnp.int32)

    # Matched gt coordinates selected in-kernel via ONE MXU matmul of the
    # one-hot argmax mask against the precomputed (8, G) coord matrix —
    # this replaced (i) a (A, 4) HBM gather (1.2 ms/step at batch 8; TPU
    # gathers are element-serial) and (ii) 4 masked VPU reduces over the
    # tile (~1 ms/step at batch 16).  Values stay bit-identical: each
    # COLUMN of sel has exactly one 1.0, so every f32 partial-sum term is
    # either +0.0 or the exact coordinate (Precision.HIGHEST keeps the
    # bf16x decomposition's hi/mid/lo splits exactly recombinable).
    sel = row_g == arg  # exactly one true per column
    picked = jax.lax.dot_general(
        coords_ref[:, :],
        sel.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, TILE_A): rows 0..3 = cx, cy, w, h
    for i, ref in enumerate(
        (matched_cx_ref, matched_cy_ref, matched_w_ref, matched_h_ref)
    ):
        ref[0:1, pl.ds(start, _TILE_A)] = picked[i : i + 1, :]


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
    # Per-gt operands ride as (G, 8)-packed columns (gt on sublanes — the
    # kernels' transposed orientation); gt_boxes is already (G, 4) so no
    # transpose is needed anywhere on the gt side.
    gtp = jnp.zeros((g_pad, 4), jnp.float32)
    gtp = gtp.at[:g].set(gt_boxes.astype(jnp.float32))
    maskf = jnp.zeros((g_pad,), jnp.float32)
    maskf = maskf.at[:g].set(gt_mask.astype(jnp.float32))
    gtf0 = jnp.zeros((g_pad, 8), jnp.float32)
    gtf0 = gtf0.at[:, 0:4].set(gtp)
    gtf0 = gtf0.at[:, 4].set(maskf)

    k = min(match_config.scale_comp_topk, a)
    kpad = max(8, k)  # tile-friendly lane count; must be >= k
    grid = (a_pad // _TILE_A,)
    best_iou, gstat_f, gstat_i = pl.pallas_call(
        functools.partial(
            _stats_kernel,
            match_threshold=match_config.match_threshold,
            k=k,
            kpad=kpad,
        ),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, a_pad), jnp.float32),  # best_iou
            jax.ShapeDtypeStruct((g_pad, 8), jnp.float32),  # gt stats f32
            jax.ShapeDtypeStruct((g_pad, 8), jnp.int32),  # gt stats i32
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((g_pad, kpad), jnp.float32),
            pltpu.VMEM((g_pad, kpad), jnp.int32),
        ],
        interpret=interpret,
    )(anchors_t, gtf0)

    if match_config.enable_scale_comp:
        needs = ((gstat_f[:, 1] < k) & (maskf > 0.0)).astype(jnp.float32)
    else:
        needs = jnp.zeros((g_pad,), jnp.float32)

    # Assign-kernel operands: gtf picks up [needs, kth] lanes; gti is the
    # stats i32 output as-is ([gt_best_anchor, kth_idx]); coords (8, G)
    # rows 0..3 = (cx, cy, w, h) — corner_to_center arithmetic.
    gtf = gtf0.at[:, 5].set(needs)
    gtf = gtf.at[:, 6].set(gstat_f[:, 2])
    gti = gstat_i
    coords = jnp.zeros((8, g_pad), jnp.float32)
    coords = coords.at[0, :].set((gtp[:, 0] + gtp[:, 2]) * 0.5)
    coords = coords.at[1, :].set((gtp[:, 1] + gtp[:, 3]) * 0.5)
    coords = coords.at[2, :].set(gtp[:, 2] - gtp[:, 0])
    coords = coords.at[3, :].set(gtp[:, 3] - gtp[:, 1])

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
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)
        ),
        interpret=interpret,
    )(anchors_t, gtf, gti, coords)

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
