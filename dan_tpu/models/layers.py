"""Functional NHWC conv/pool/norm primitives with TF-compatible semantics.

TPU-native conventions:
  * NHWC activations, HWIO kernels (XLA's preferred conv layout on TPU);
  * 'SAME' padding uses XLA's TF-compatible asymmetric padding — required
    for bit-parity with the TF1 reference on stride-2 convs (SURVEY.md §7
    'Bit-compatibility vs TF1');
  * bf16 compute with f32 params: params stay f32, activations are cast by
    the caller. Convs deliberately do NOT pin preferred_element_type — see
    conv2d's docstring (it breaks conv-transpose autodiff for mixed
    dtypes); the MXU accumulates bf16 matmuls in f32 internally anyway.

Params are plain nested dicts (pytrees): {'kernel': (kh, kw, cin, cout),
'bias': (cout,)} — trivially checkpointable and importable from TF ckpts.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def conv_init(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """He-normal (MSRA) conv kernel init + zero bias [K — family default]."""
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    kernel = jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
    return {"kernel": kernel, "bias": jnp.zeros((cout,), dtype)}


def conv2d(
    params,
    x: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "SAME",
    activation: bool = True,
) -> jnp.ndarray:
    """3x3/1x1 conv + bias (+ ReLU) in the activation dtype.

    No explicit preferred_element_type: XLA:TPU accumulates bf16 convs in
    f32 on the MXU natively, and a mixed-dtype conv (f32 out of bf16 in)
    breaks the conv transpose rule under reverse-mode autodiff.
    """
    kernel = params["kernel"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + params["bias"].astype(x.dtype)
    if activation:
        out = jax.nn.relu(out)
    return out


def max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pool, 'SAME' padding (TF semantics).

    Init must be -inf (not finfo.min) for lax.reduce_window's max monoid to
    have a reverse-mode autodiff rule.
    """
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )


def l2norm_init(channels: int, scale_init: float, dtype=jnp.float32):
    """Learned channelwise L2-norm scale [K — S3FD: inits 10/8/5]."""
    return {"scale": jnp.full((channels,), scale_init, dtype)}


def l2_normalize(params, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Channelwise L2 normalization with learned scale (ParseNet-style).

    Matches the reference family's `l2_normalize_layer` [?]: normalize each
    spatial position's channel vector to unit norm, multiply by a learned
    per-channel scale.  Norm computed in f32 for bf16 activations.
    """
    xf = x.astype(jnp.float32)
    norm = jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * norm * params["scale"].astype(jnp.float32)).astype(x.dtype)


def upsample2x(x: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """2x spatial upsample (TF half-pixel bilinear semantics via jax.image).

    Stays the dense weight-matrix dot jax.image.resize lowers to: an
    elementwise 2-tap reformulation (exact same samples, stack+reshape
    row interleave) was measured at batch 128 on v5e and lost BADLY —
    XLA:TPU lowers the interleave as 5-D slice/pad loop fusions
    (~33 ms/iter of new HBM ops; detect 279.6 -> 366.8 ms/iter) while
    the two resize dots cost only ~6 ms.  See BASELINE.md round-3 rows.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method=method).astype(x.dtype)


def split_key(key, n: int) -> Tuple:
    return tuple(jax.random.split(key, n))
