"""Detection loss: softmax cross-entropy + hard-negative mining + smooth-L1.

Behavior contract (SURVEY.md §2 'Loss + hard-negative mining' [B][K]):
  * per-anchor 2-class softmax CE (face vs background);
  * HNM: rank negative anchors by their CE loss, keep `hnm_ratio` x #positives
    hardest negatives per image [B: HNM exists; K: 3:1 ratio];
  * smooth-L1 on positive anchors' encoded offsets;
  * total = cls + alpha * loc, normalized by the positive count.

TPU-native formulation: dynamic per-image negative counts are handled with
a masked rank-threshold select (one value sort + cumsum tie-break -> exact
top-k with deterministic index tie-breaks), so the whole loss is
fixed-shape (SURVEY.md §7 'HNM with dynamic positive counts').
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import TrainConfig


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber delta=1) [K — `modified_smooth_l1`]."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _select_topk_desc(values: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Mask of the k largest elements per row, ties to lower index first.

    Exactly the `rank < k` set of a stable descending argsort (rank =
    #strictly-greater + #equal-at-lower-index), but via ONE value-only
    sort + a cumsum tie-break instead of the double-argsort rank trick
    this replaced: the argsort pair-sorts (value, index) twice, which
    measured ~2x the cost of sorting bare f32 values once (scatters are
    even worse on TPU — element-serial, 1.6 ms/step at (8, 34125)).

    values: (B, A) f32; k: (B,) int32 in [0, A].  Rows with k=0 select
    nothing (the k-1 threshold index is clamped, then masked here).
    """
    a = values.shape[1]
    sv = -jnp.sort(-values, axis=1)  # descending
    idx = jnp.clip(k - 1, 0, a - 1)
    t = jnp.take_along_axis(sv, idx[:, None], axis=1)  # (B, 1) k-th largest
    above = values > t
    n_above = jnp.sum(above, axis=1, keepdims=True).astype(jnp.int32)
    tie = values == t
    tie_rank = jnp.cumsum(tie.astype(jnp.int32), axis=1) - tie  # exclusive
    sel = above | (tie & (tie_rank < k[:, None] - n_above))
    return sel & (k[:, None] > 0)


def detection_loss(
    cls_logits: jnp.ndarray,
    loc_preds: jnp.ndarray,
    cls_targets: jnp.ndarray,
    loc_targets: jnp.ndarray,
    config: TrainConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Batched loss.

    Args:
      cls_logits: (B, A, 2) f32.
      loc_preds: (B, A, 4) f32.
      cls_targets: (B, A) int32 in {-1 ignore, 0 bg, 1 face}.
      loc_targets: (B, A, 4) f32.
    Returns (scalar total loss, metrics dict).
    """
    positive = cls_targets == 1  # (B, A)
    negative = cls_targets == 0
    labels = jnp.maximum(cls_targets, 0)  # ignore -> bg label (masked out below)

    log_probs = jax.nn.log_softmax(cls_logits, axis=-1)  # (B, A, 2)
    # Two classes: select the labeled log-prob with an elementwise where
    # instead of take_along_axis (TPU gathers are element-serial and the
    # gather alone measured 2.7 ms/step at (8, 34125, 2)); same values.
    ce = -jnp.where(labels == 1, log_probs[..., 1], log_probs[..., 0])

    # --- hard-negative mining (per image, fixed shape) ---
    num_pos = jnp.sum(positive, axis=1)  # (B,)
    # 3:1 rule [K]; the hnm_min_negatives floor applies only to images with
    # NO positives (otherwise it would skew sparse-face crops toward
    # background, diverging from the documented S3FD recipe).
    wanted = jnp.where(
        num_pos > 0,
        (config.hnm_ratio * num_pos).astype(jnp.int32),
        config.hnm_min_negatives,
    )
    num_neg_keep = jnp.minimum(
        wanted, jnp.sum(negative, axis=1).astype(jnp.int32)
    )  # (B,)
    neg_ce = jnp.where(negative, ce, -jnp.inf)  # (B, A)
    neg_selected = negative & _select_topk_desc(neg_ce, num_neg_keep)

    total_pos = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
    cls_loss = (
        jnp.sum(jnp.where(positive | neg_selected, ce, 0.0)) / total_pos
    )

    loc_l1 = jnp.sum(smooth_l1(loc_preds - loc_targets), axis=-1)  # (B, A)
    loc_loss = jnp.sum(jnp.where(positive, loc_l1, 0.0)) / total_pos

    total = cls_loss + config.loc_loss_weight * loc_loss
    metrics = {
        "loss": total,
        "cls_loss": cls_loss,
        "loc_loss": loc_loss,
        "num_pos": jnp.sum(num_pos).astype(jnp.float32),
        "num_neg_selected": jnp.sum(neg_selected).astype(jnp.float32),
    }
    return total, metrics
