"""Anchor generation for the six detection scales.

Reference behavior contract (SURVEY.md §2 'Anchor generation', [B]/[K]):
for each layer with stride s, one square anchor of size 4*s per feature-map
position, centered at (i + 0.5) * s, aspect ratio 1 only (S3FD
'equal-proportion interval' rule).  The reference computes these host-side in
`utility/anchor_manipulator.py` [?]; here they are a precomputed constant
array that lives in HBM and is closed over by jitted functions.

Box conventions used throughout dan_tpu:
  * corner format: (x1, y1, x2, y2) in **pixels** of the network input.
  * center format: (cx, cy, w, h) in pixels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from dan_tpu.config import AnchorConfig


def layer_anchor_centers(
    feat_h: int, feat_w: int, stride: int, offset: float = 0.5
) -> np.ndarray:
    """(feat_h*feat_w, 2) array of (cx, cy) anchor centers, row-major."""
    ys = (np.arange(feat_h, dtype=np.float32) + offset) * stride
    xs = (np.arange(feat_w, dtype=np.float32) + offset) * stride
    cx, cy = np.meshgrid(xs, ys)  # each (feat_h, feat_w)
    return np.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)


@functools.lru_cache(maxsize=32)
def generate_anchors_np(
    config: AnchorConfig, image_h: int, image_w: int
) -> np.ndarray:
    """All anchors for an (image_h, image_w) input, concatenated over the six
    layers in order, as an (A, 4) float32 array in **center** format.

    Row-major per layer, matching the (H, W, anchors) flattening of the head
    outputs in dan_tpu.models.
    """
    per_layer = []
    for layer in config.layers:
        fh = -(-image_h // layer.stride)
        fw = -(-image_w // layer.stride)
        centers = layer_anchor_centers(fh, fw, layer.stride, layer.offset)
        wh = np.full_like(centers, layer.anchor_size)
        per_layer.append(np.concatenate([centers, wh], axis=-1))
    out = np.concatenate(per_layer, axis=0).astype(np.float32)
    # lru_cache hands the SAME array to every caller: make it read-only so
    # an in-place mutation can't silently poison the process-wide cache.
    out.setflags(write=False)
    return out


def generate_anchors(
    config: AnchorConfig, image_h: int, image_w: int
) -> jnp.ndarray:
    """Device constant of all anchors in center format (A, 4)."""
    return jnp.asarray(generate_anchors_np(config, image_h, image_w))


def layer_anchor_counts(
    config: AnchorConfig, image_h: int, image_w: int
) -> Tuple[int, ...]:
    return tuple(
        (-(-image_h // l.stride)) * (-(-image_w // l.stride))
        for l in config.layers
    )


def center_to_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def corner_to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )
