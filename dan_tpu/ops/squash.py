"""Eval-time resize: squash an arbitrary (src_h, src_w) image region held in
a fixed uint8 canvas to the square network input, entirely on device.

Mirrors the reference's `preprocess_for_eval` (SURVEY.md §2 'Eval
preprocessing' [B]): plain bilinear resize to the target (no aspect
preservation), mean subtraction — with TF1 resize semantics (half-pixel, no
antialias).  src_h/src_w are traced scalars so one compiled executable per
canvas bucket serves every image size.
"""
from __future__ import annotations

import jax.numpy as jnp

from dan_tpu.config import PreprocessConfig
from dan_tpu.ops.preprocess import bilinear_resample, normalize_image


def squash_resize(
    canvas: jnp.ndarray,
    src_h: jnp.ndarray,
    src_w: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "bilinear",
    semantics: str = "half_pixel",
) -> jnp.ndarray:
    """(C, C, 3) float canvas -> (out_h, out_w, 3): resizes the top-left
    (src_h, src_w) region to fill the output (MXU matmul resample),
    edge-clamping at the true image extent like TF resize.  `semantics`
    follows PreprocessConfig.resize_semantics ('half_pixel' | 'tf1_legacy'
    [?])."""
    return bilinear_resample(
        canvas,
        out_h,
        out_w,
        out_h / src_h,
        out_w / src_w,
        region=(0.0, src_h, 0.0, src_w),
        semantics=semantics,
    )


def eval_preprocess(
    canvas_u8: jnp.ndarray,
    src_h: jnp.ndarray,
    src_w: jnp.ndarray,
    out_size: int,
    cfg: PreprocessConfig,
) -> jnp.ndarray:
    """uint8 canvas -> normalized f32 (out_size, out_size, 3) network input."""
    img = squash_resize(
        canvas_u8.astype(jnp.float32), src_h, src_w, out_size, out_size,
        semantics=cfg.resize_semantics,
    )
    return normalize_image(img, cfg)
