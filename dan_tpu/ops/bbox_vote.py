"""On-device bbox-vote fusion of TTA detections.

Behavior contract (SURVEY.md §2 'bbox-vote fusion' [B][K]): iteratively take
the remaining detection with max score; all detections with IoU >= threshold
merge into one output whose coordinates are the score-weighted average and
whose score is the group max; merged detections are removed.  The reference
computes this host-side in numpy; the north star requires it on-device [B].

Fixed shapes: (N, 5) in -> (max_out, 5) + validity out, via lax.while_loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dan_tpu.box.iou import iou_one_to_many


class VoteResult(NamedTuple):
    boxes: jnp.ndarray  # (max_out, 4)
    scores: jnp.ndarray  # (max_out,)
    valid: jnp.ndarray  # (max_out,) bool


def bbox_vote(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    in_valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> VoteResult:
    """Args: (N, 4) corner boxes, (N,) scores, (N,) bool validity."""

    def body(state):
        i, active, out_boxes, out_scores, out_valid = state
        masked = jnp.where(active, scores, -jnp.inf)
        j = jnp.argmax(masked)
        valid = masked[j] > -jnp.inf
        iou = iou_one_to_many(boxes[j], boxes)
        merge = active & (iou >= iou_threshold)
        merge = merge | (jnp.arange(boxes.shape[0]) == j) & active
        w = jnp.where(merge, scores, 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        fused = jnp.sum(boxes * w[:, None], axis=0) / wsum
        out_boxes = out_boxes.at[i].set(jnp.where(valid, fused, 0.0))
        out_scores = out_scores.at[i].set(jnp.where(valid, scores[j], 0.0))
        out_valid = out_valid.at[i].set(valid)
        active = active & ~merge
        return i + 1, active, out_boxes, out_scores, out_valid

    def cond(state):
        i, active, *_ = state
        return (i < max_out) & jnp.any(active)

    init = (
        jnp.array(0, jnp.int32),
        in_valid & (scores > 0.0),
        jnp.zeros((max_out, 4), jnp.float32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.zeros((max_out,), bool),
    )
    _, _, out_boxes, out_scores, out_valid = jax.lax.while_loop(cond, body, init)
    return VoteResult(out_boxes, out_scores, out_valid)


def bbox_vote_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    in_valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> VoteResult:
    """Batched XLA twin of bbox_vote: (B, N, 4)/(B, N)/(B, N) ->
    VoteResult with (B, max_out, ...) leaves.  vmap of the while_loop
    (the loop runs until every row is exhausted; rows finish early via
    their own validity masks).  The Pallas lockstep twin is
    ops.bbox_vote_pallas.bbox_vote_pallas_batched — parity-tested."""
    return jax.vmap(bbox_vote, in_axes=(0, 0, 0, None, None))(
        boxes, scores, in_valid, iou_threshold, max_out
    )
