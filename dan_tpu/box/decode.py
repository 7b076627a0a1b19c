"""Box decoding — inverse of the SSD encoding, entirely on-device.

Behavior contract (SURVEY.md §2 'Decoding' [B]): inverse-transform predicted
offsets back to corner boxes and clip to the image.  The reference runs this
host-side via numpy/tf.py_func [B]; here it is pure XLA (fused into the
jitted detect step).
"""
from __future__ import annotations

import jax.numpy as jnp

from dan_tpu.box.anchors import center_to_corner


def decode_boxes(
    loc_pred: jnp.ndarray,
    anchors_center: jnp.ndarray,
    prior_scaling,
    image_h: float | None = None,
    image_w: float | None = None,
) -> jnp.ndarray:
    """Decode (..., A, 4) predicted offsets against (A, 4) center anchors.

    Returns corner-format boxes, optionally clipped to [0, w] x [0, h].
    """
    s = jnp.asarray(prior_scaling, dtype=loc_pred.dtype)
    acx, acy, aw, ah = (anchors_center[..., i] for i in range(4))
    tx, ty, tw, th = (loc_pred[..., i] for i in range(4))
    cx = tx * s[0] * aw + acx
    cy = ty * s[1] * ah + acy
    # Clamp the exponent to keep decoded sizes finite for garbage logits.
    w = jnp.exp(jnp.minimum(tw * s[2], 10.0)) * aw
    h = jnp.exp(jnp.minimum(th * s[3], 10.0)) * ah
    boxes = center_to_corner(jnp.stack([cx, cy, w, h], axis=-1))
    if image_h is not None and image_w is not None:
        x1 = jnp.clip(boxes[..., 0], 0.0, image_w)
        y1 = jnp.clip(boxes[..., 1], 0.0, image_h)
        x2 = jnp.clip(boxes[..., 2], 0.0, image_w)
        y2 = jnp.clip(boxes[..., 3], 0.0, image_h)
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return boxes
