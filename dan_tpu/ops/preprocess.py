"""Fused on-device preprocessing — the TPU-native replacement for the
reference's host-side tf.image chain (SURVEY.md §3.1, BASELINE.json north
star: "resize, data-anchor-sampling crops, color distortion, normalization
becomes a fused on-device JAX/Pallas preprocessing stage").

Host responsibility is reduced to file I/O + JPEG decode + scalar crop-
parameter sampling (dan_tpu.data.augment); everything pixel-shaped here runs
inside the jitted train/eval step:

  * crop + resample (bilinear, TF half-pixel semantics) via
    jax.image.scale_and_translate with a fixed output shape;
  * color distortion: brightness / contrast / saturation / hue in one of
    two orders chosen per-image [K — tf.image distort_color];
  * horizontal flip of image and boxes;
  * VGG mean subtraction.

Images flow as uint8 canvases (host -> HBM, minimal H2D bytes) and are
converted/normalized on device.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import PreprocessConfig


class CropParams(NamedTuple):
    """Scalar crop window in source-canvas pixels (host-sampled)."""

    x0: jnp.ndarray  # float32 ()
    y0: jnp.ndarray
    size: jnp.ndarray  # square window side


# ---------------------------------------------------------------------------
# color space
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0,1] -> HSV in [0,1] (TF-compatible)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rangec = maxc - minc
    safe_range = jnp.where(rangec > 0, rangec, 1.0)
    s = jnp.where(maxc > 0, rangec / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe_range
    gc = (maxc - g) / safe_range
    bc = (maxc - b) / safe_range
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(rangec > 0, h, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) HSV in [0,1] -> RGB in [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# color distortion [B: 'color distortion'; K: tf.image chain + random order]
# ---------------------------------------------------------------------------


def _brightness(x, key, cfg):
    delta = jax.random.uniform(
        key, (), minval=-cfg.brightness_max_delta, maxval=cfg.brightness_max_delta
    )
    return jnp.clip(x + delta, 0.0, 1.0)


def _contrast(x, key, cfg):
    factor = jax.random.uniform(
        key, (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    return jnp.clip((x - mean) * factor + mean, 0.0, 1.0)


def _saturation(x, key, cfg):
    factor = jax.random.uniform(
        key, (), minval=cfg.saturation_range[0], maxval=cfg.saturation_range[1]
    )
    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    return hsv_to_rgb(hsv)


def _hue(x, key, cfg):
    delta = jax.random.uniform(
        key, (), minval=-cfg.hue_max_delta, maxval=cfg.hue_max_delta
    )
    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return hsv_to_rgb(hsv)


def color_distort(
    x: jnp.ndarray, key: jax.Array, cfg: PreprocessConfig
) -> jnp.ndarray:
    """Random photometric distortion of an RGB image in [0,1].

    Applies brightness/contrast/saturation/hue in one of two orders chosen
    at random (tf.image `distort_color` ordering trick [K]), gated by
    cfg.color_distort_prob.
    """
    k_gate, k_order, k1, k2, k3, k4 = jax.random.split(key, 6)

    def order_a(x):
        x = _brightness(x, k1, cfg)
        x = _saturation(x, k2, cfg)
        x = _hue(x, k3, cfg)
        return _contrast(x, k4, cfg)

    def order_b(x):
        x = _brightness(x, k1, cfg)
        x = _contrast(x, k2, cfg)
        x = _saturation(x, k3, cfg)
        return _hue(x, k4, cfg)

    distorted = jax.lax.cond(
        jax.random.bernoulli(k_order), order_a, order_b, x
    )
    return jax.lax.cond(
        jax.random.bernoulli(k_gate, cfg.color_distort_prob),
        lambda _: distorted,
        lambda _: x,
        None,
    )


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def crop_and_resize(
    image: jnp.ndarray,
    crop: CropParams,
    out_size: int,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Sample a square crop window to a fixed (out_size, out_size).

    image: (H, W, C) float. Window may extend beyond the canvas; out-of-
    bounds samples are zero (scale_and_translate pads with zeros), which
    matches padding the source image before cropping.

    Mapping: output pixel o samples input at
        i = (o + 0.5) / s + crop0 - 0.5,  s = out_size / crop.size
    which is exactly TF half-pixel bilinear resize of the crop window.
    """
    s = out_size / crop.size
    scale = jnp.stack([s, s])
    translation = jnp.stack([-crop.y0 * s, -crop.x0 * s])
    # antialias=False: TF1's tf.image.resize_images bilinear samples the 2x2
    # neighborhood with no antialiasing filter even when minifying — required
    # for bit-parity with the reference's resize [SURVEY.md §7].
    return jax.image.scale_and_translate(
        image,
        (out_size, out_size, image.shape[-1]),
        (0, 1),
        scale,
        translation,
        method=method,
        antialias=False,
    )


def resize_image(
    image: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear"
) -> jnp.ndarray:
    """Plain full-image resize (TF half-pixel semantics, no antialias)."""
    return jax.image.resize(
        image, (out_h, out_w, image.shape[-1]), method=method, antialias=False
    )


def transform_boxes(
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
    crop: CropParams,
    out_size: int,
    min_size: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map (G, 4) corner boxes through the crop+resize; update validity.

    Reference semantics [K — data-anchor-sampling keeps boxes whose center
    lies inside the crop]: boxes are clipped to the window; a box survives
    if its center is inside and its clipped size >= min_size output pixels.
    """
    s = out_size / crop.size
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    center_in = (
        (cx >= crop.x0)
        & (cx < crop.x0 + crop.size)
        & (cy >= crop.y0)
        & (cy < crop.y0 + crop.size)
    )
    new = jnp.stack(
        [
            (boxes[:, 0] - crop.x0) * s,
            (boxes[:, 1] - crop.y0) * s,
            (boxes[:, 2] - crop.x0) * s,
            (boxes[:, 3] - crop.y0) * s,
        ],
        axis=-1,
    )
    new = jnp.clip(new, 0.0, float(out_size))
    w = new[:, 2] - new[:, 0]
    h = new[:, 3] - new[:, 1]
    new_mask = mask & center_in & (w >= min_size) & (h >= min_size)
    return jnp.where(new_mask[:, None], new, 0.0), new_mask


def hflip(
    image: jnp.ndarray, boxes: jnp.ndarray, mask: jnp.ndarray, width: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizontal flip of (H, W, C) image + (G, 4) corner boxes."""
    flipped = image[:, ::-1, :]
    fb = jnp.stack(
        [width - boxes[:, 2], boxes[:, 1], width - boxes[:, 0], boxes[:, 3]],
        axis=-1,
    )
    return flipped, jnp.where(mask[:, None], fb, 0.0)


def normalize_image(x: jnp.ndarray, cfg: PreprocessConfig) -> jnp.ndarray:
    """RGB [0,255] float -> mean-subtracted network input [B]."""
    mean = jnp.asarray(cfg.mean_rgb, dtype=x.dtype)
    std = jnp.asarray(cfg.std_rgb, dtype=x.dtype)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# fused train-time pipeline stage (per image; vmapped by the caller)
# ---------------------------------------------------------------------------


def train_preprocess_one(
    canvas_u8: jnp.ndarray,
    crop: CropParams,
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    cfg: PreprocessConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """uint8 canvas + host-sampled crop params -> normalized f32 train image.

    Returns (image (S, S, 3) f32 mean-subtracted, boxes (G, 4), mask (G,)).
    The whole function is jit/vmap-friendly: fixed shapes, no host math.
    """
    size = cfg.train_image_size
    k_color, k_flip = jax.random.split(key)
    img = canvas_u8.astype(jnp.float32) / 255.0
    img = crop_and_resize(img, crop, size)
    boxes, mask = transform_boxes(boxes, mask, crop, size, cfg.min_box_size)
    img = color_distort(img, k_color, cfg)
    do_flip = jax.random.bernoulli(k_flip, cfg.flip_prob)
    img_f, boxes_f = hflip(img, boxes, mask, float(size))
    img = jnp.where(do_flip, img_f, img)
    boxes = jnp.where(do_flip, boxes_f, boxes)
    img = normalize_image(img * 255.0, cfg)
    return img, boxes, mask
