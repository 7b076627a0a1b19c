"""Anchor->ground-truth matching and target encoding.

Behavior contract (SURVEY.md §2 'Matching + encoding' [B][K]):
  * jaccard IoU of anchors x gt;
  * an anchor matches the gt of its highest IoU if that IoU >= threshold
    (S3FD 0.35 [K]);
  * force-match: every gt claims its single best anchor regardless;
  * S3FD scale compensation [K]: a gt matched by fewer than N anchors
    additionally takes its top-N anchors with IoU > 0.1;
  * matched boxes encode as
      (dcx/w_a/s1, dcy/h_a/s1, log(w/w_a)/s2, log(h/h_a)/s2)
    with prior scaling s = (0.1, 0.1, 0.2, 0.2) [K].

The reference does this host-side inside the input pipeline
(`utility/anchor_manipulator.py::AnchorEncoder.encode_all_anchors` [?]);
here it is a fixed-shape jittable function that runs on-device inside the
train step (MAX_GT padding + validity mask).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dan_tpu.box.anchors import center_to_corner, corner_to_center
from dan_tpu.box.iou import pairwise_iou
from dan_tpu.config import AnchorConfig, MatchConfig


class MatchTargets(NamedTuple):
    """Per-anchor training targets (fixed shapes).

    cls_target: (A,) int32 — 0 background, 1 face, -1 ignore.
    loc_target: (A, 4) float32 — encoded offsets (zeros for non-positives).
    matched_gt: (A,) int32 — index of the matched gt (valid where positive).
    matched_iou: (A,) float32 — raw best IoU per anchor (pre-augmentation).
    """

    cls_target: jnp.ndarray
    loc_target: jnp.ndarray
    matched_gt: jnp.ndarray
    matched_iou: jnp.ndarray


def encode_boxes(
    gt_center: jnp.ndarray, anchors_center: jnp.ndarray, prior_scaling
) -> jnp.ndarray:
    """SSD box encoding, both inputs (..., 4) center-format."""
    s = jnp.asarray(prior_scaling, dtype=jnp.float32)
    acx, acy, aw, ah = (anchors_center[..., i] for i in range(4))
    gcx, gcy, gw, gh = (gt_center[..., i] for i in range(4))
    # Guard logs/divides against padded (zero-size) gt rows; such rows are
    # never selected as positives so the value is irrelevant, but must be
    # finite to keep gradients clean.
    gw = jnp.maximum(gw, 1e-6)
    gh = jnp.maximum(gh, 1e-6)
    tx = (gcx - acx) / aw / s[0]
    ty = (gcy - acy) / ah / s[1]
    tw = jnp.log(gw / aw) / s[2]
    th = jnp.log(gh / ah) / s[3]
    return jnp.stack([tx, ty, tw, th], axis=-1)


def match_anchors(
    anchors_center: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    match_config: MatchConfig,
    anchor_config: AnchorConfig,
) -> MatchTargets:
    """Assign targets for one image.

    Args:
      anchors_center: (A, 4) center-format anchors.
      gt_boxes: (G, 4) corner-format ground-truth boxes, zero-padded.
      gt_mask: (G,) bool validity of each gt row.
    """
    anchors_corner = center_to_corner(anchors_center)
    valid = gt_mask.astype(jnp.float32)  # (G,)
    iou = pairwise_iou(anchors_corner, gt_boxes) * valid[None, :]  # (A, G)
    num_anchors = anchors_center.shape[0]

    # --- stage 0: raw per-anchor best (used for the ignore band) ---
    raw_best_iou = jnp.max(iou, axis=1)  # (A,)

    # --- forced matches: each valid gt claims its best anchor ---
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (G,)
    forced = jax.nn.one_hot(
        best_anchor_per_gt, num_anchors, dtype=jnp.float32
    ).T * valid[None, :]  # (A, G)

    aug = iou + 2.0 * forced

    # --- S3FD scale compensation [K] ---
    if match_config.enable_scale_comp:
        k = min(match_config.scale_comp_topk, num_anchors)
        # Matches each gt would get under the plain threshold rule.
        anchor_best_gt = jnp.argmax(iou, axis=1)  # (A,)
        anchor_pos = raw_best_iou >= match_config.match_threshold
        per_gt_count = jnp.sum(
            jax.nn.one_hot(anchor_best_gt, gt_boxes.shape[0], dtype=jnp.float32)
            * anchor_pos[:, None].astype(jnp.float32),
            axis=0,
        )  # (G,)
        needs_comp = (per_gt_count < k) & gt_mask  # (G,)
        # Top-k anchors per gt column.
        topk_iou, topk_idx = jax.lax.top_k(iou.T, k)  # (G, k)
        eligible = (topk_iou > match_config.scale_comp_iou) & needs_comp[:, None]
        comp = jnp.zeros((gt_boxes.shape[0], num_anchors), dtype=jnp.float32)
        comp = jax.vmap(
            lambda row, idx, el: row.at[idx].add(el.astype(jnp.float32))
        )(comp, topk_idx, eligible)
        aug = aug + jnp.minimum(comp.T, 1.0)

    # --- final assignment: per-anchor best over augmented IoU ---
    matched_iou_aug = jnp.max(aug, axis=1)
    matched_gt = jnp.argmax(aug, axis=1).astype(jnp.int32)
    positive = matched_iou_aug >= match_config.match_threshold

    ignore = (
        (raw_best_iou >= match_config.ignore_threshold)
        & (raw_best_iou < match_config.match_threshold)
        & ~positive
    )
    cls_target = jnp.where(
        positive, 1, jnp.where(ignore, -1, 0)
    ).astype(jnp.int32)

    gt_center = corner_to_center(gt_boxes)  # (G, 4)
    matched_center = gt_center[matched_gt]  # (A, 4)
    loc_target = encode_boxes(
        matched_center, anchors_center, anchor_config.prior_scaling
    )
    loc_target = jnp.where(positive[:, None], loc_target, 0.0)

    return MatchTargets(
        cls_target=cls_target,
        loc_target=loc_target,
        matched_gt=matched_gt,
        matched_iou=raw_best_iou,
    )


def match_anchors_batch(
    anchors_center: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    match_config: MatchConfig,
    anchor_config: AnchorConfig,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> MatchTargets:
    """Per-image map of match_anchors over a leading batch dim.

    On TPU this dispatches to the Pallas kernel
    (dan_tpu.ops.matching_pallas) — bit-identical targets, ~10x faster at
    640x640/G=256 than the XLA path (which materializes (A, G) in HBM).
    The kernel's cost is linear in the padded gt-lane count, and most
    crops carry far fewer than 128 valid gts, so images whose valid gts
    all sit in the first 128 slots take a half-width G=128 kernel variant
    (identical outputs: the dropped lanes are all masked, and every
    reduction's tie-break prefers lower gt indices, so removing trailing
    masked lanes cannot change any per-anchor result).  The per-image
    lax.cond requires a real branch, so the batch dim runs as a
    lax.map scan rather than vmap (vmap would convert cond to select and
    execute BOTH kernel variants per image).
    """
    if use_pallas is None:
        from dan_tpu.utils.platform import on_tpu

        use_pallas = on_tpu()
    if use_pallas:
        from dan_tpu.ops.matching_pallas import match_anchors_pallas

        g = gt_boxes.shape[1]
        if g > 128:
            def fn(b, m):
                small_ok = ~jnp.any(m[128:])
                return jax.lax.cond(
                    small_ok,
                    lambda: match_anchors_pallas(
                        anchors_center, b[:128], m[:128],
                        match_config, anchor_config, interpret=interpret,
                    ),
                    lambda: match_anchors_pallas(
                        anchors_center, b, m, match_config, anchor_config,
                        interpret=interpret,
                    ),
                )

            return jax.lax.map(
                lambda bm: fn(bm[0], bm[1]), (gt_boxes, gt_mask)
            )

        fn = lambda b, m: match_anchors_pallas(  # noqa: E731
            anchors_center, b, m, match_config, anchor_config,
            interpret=interpret,
        )
    else:
        fn = lambda b, m: match_anchors(  # noqa: E731
            anchors_center, b, m, match_config, anchor_config
        )
    return jax.vmap(fn)(gt_boxes, gt_mask)
