"""Post-training int8 quantization (PTQ) of the inference path.

The reference (a TF1 research repo) has no quantized serving mode; this is
a beyond-parity deployment feature motivated by TPU hardware: the v5e MXU
executes s8 x s8 -> s32 at 2x the bf16 rate, and int8 activations halve
HBM traffic for the bandwidth-bound layers.  A standalone layer probe
(scripts/probe_int8_conv.py, 2026-08-19) measured a conv3-shaped
conv+bias+relu layer at 1.49x its bf16 formulation on v5e.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8, scale = absmax / 127;
  * activations: per-tensor symmetric int8, scale calibrated as the
    running absmax over a calibration set (collect_act_absmax);
  * every body conv computes s8 conv -> s32, dequantizes with the folded
    (act_scale * w_scale[c]) vector, adds bias, relus, and requantizes
    for the next conv — the whole epilogue is one elementwise chain XLA
    fuses into the conv output;
  * max pools run ON int8: round(relu(y)/s) is monotone in y, so
    pool(quant(y)) == quant(pool(y)) exactly — pools never dequantize;
  * the phase-packed conv1 block keeps conv1_1' in bf16 (3 input
    channels starve the MXU; int8 buys nothing there) and quantizes the
    heavy conv1_2' (1.78x-FLOP packed conv); the phase-pool max runs on
    the dequantized f32 accumulator exactly as the bf16 graph does;
  * LFPN / L2Norm / multibox heads stay bf16: they are a small fraction
    of the FLOPs and the most accuracy-sensitive (L2Norm renormalizes,
    heads produce the logits).

Quantization is fully DERIVED state: no config field, no checkpoint
format change.  `quantize_detector_params(params, config, act_scales)`
precomputes a self-contained qparams pytree (int8 kernels + folded f32
dequant vectors + the bf16 conv1 pieces + the untouched f32 LFPN/head/
L2Norm subtrees); `quantized_detector_forward(qparams, images, config)`
mirrors `detector_forward` on it.  `Detector.quantize_int8(calib_images)`
is the user surface (dan_tpu/api.py).

Accuracy: validated end-to-end by tests/unit/test_quant.py (exact
integer-math oracle on the conv path, stats-forward tap parity, logits
closeness vs the f32 graph) and at the AP level by the quantized leg of
scripts/smoke_e2e.py on real TPU.  A deployment quantizing a real
checkpoint should re-validate WIDER AP with its own calibration set
(SURVEY.md §0 — the reference ckpt/dataset are not present here).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.heads import heads_forward
from dan_tpu.models.layers import conv2d, l2_normalize, max_pool
from dan_tpu.models.lfpn import lfpn_forward
from dan_tpu.models.vgg import (
    TAP_NAMES,
    VGG_BLOCKS,
    _pack_conv_kernel_2x2_phase,
    _pack_conv_kernel_stride2,
    _phase_slices,
)

_DN = ("NHWC", "HWIO", "NHWC")


def body_plan(config: ModelConfig) -> List[Tuple[str, int, int, bool, bool]]:
    """The quantized body's conv order after the conv1 block:
    (name, stride, dilation, is_tap, pool_after) per conv."""
    plan: List[Tuple[str, int, int, bool, bool]] = []
    for block in VGG_BLOCKS[1:]:
        for i, (name, _) in enumerate(block):
            plan.append((name, 1, 1, name in TAP_NAMES, i == len(block) - 1))
    plan.append(("fc6", 1, config.fc6_dilation, False, False))
    plan.append(("fc7", 1, 1, True, False))
    for i in range(6, 6 + len(config.extra_channels)):
        plan.append((f"conv{i}_1", 1, 1, False, False))
        plan.append((f"conv{i}_2", 2, 1, f"conv{i}_2" in TAP_NAMES, False))
    return plan


def act_scale_names(config: ModelConfig) -> List[str]:
    """Every activation-scale key: each quantized conv, keyed by the conv
    that CONSUMES the activation ('conv1_2' = relu(conv1_1'),
    'conv2_1' = pool1, other body convs = predecessor's relu output)."""
    return ["conv1_2"] + [n for n, *_ in body_plan(config)]


def _quantize_act(y: jnp.ndarray, scale) -> jnp.ndarray:
    """f32 activation -> symmetric int8 with a per-tensor scale."""
    q = jnp.round(y * (1.0 / scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _quantize_kernel(k: jnp.ndarray):
    """f32 (kh, kw, ci, co) -> (int8 kernel, (co,) f32 per-channel scale)."""
    k = k.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
    return q, s


def _conv_i8(x_q, k_q, stride=1, dilation=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x_q,
        k_q,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def _max_pool_i8(q: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool on int8 (inference-only; no autodiff monoid needed).
    Exact vs pool-then-quantize: round(relu(y)/s) is monotone in y."""
    return jax.lax.reduce_window(
        q,
        jnp.int8(jnp.iinfo(jnp.int8).min),
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="SAME",
    )


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def collect_act_absmax(
    params: Dict, x: jnp.ndarray, config: ModelConfig
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """One f32/bf16 forward over normalized images x, returning
    (taps, {scale_name: batch absmax f32 scalar}).

    Mirrors vgg_forward's inference path exactly — the taps are returned
    so tests can pin the mirror against the real forward bit-for-bit
    (test_quant.py::test_stats_forward_tap_parity).  Callers jit this per
    calibration batch and keep the running max.
    """
    bb = params["backbone"]
    stats: Dict[str, jnp.ndarray] = {}
    taps: Dict[str, jnp.ndarray] = {}

    def absmax(v):
        return jnp.max(jnp.abs(v.astype(jnp.float32)))

    packed = (
        config.conv1_packed and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    )
    if packed:
        dt = x.dtype
        k1 = _pack_conv_kernel_stride2(bb["conv1_1"]["kernel"]).astype(dt)
        b1 = jnp.tile(bb["conv1_1"]["bias"], 4).astype(dt)
        o1 = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, k1, (2, 2), ((1, 2), (1, 2)), dimension_numbers=_DN
            )
            + b1
        )
        stats["conv1_2"] = absmax(o1)
        k2 = _pack_conv_kernel_2x2_phase(bb["conv1_2"]["kernel"]).astype(dt)
        b2 = bb["conv1_2"]["bias"].astype(dt)
        r = jax.lax.conv_general_dilated(
            o1, k2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN
        )
        s = _phase_slices(r, b2.shape[0])
        m = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
        y = jax.nn.relu(m + b2)
    else:
        y = conv2d(bb["conv1_1"], x)
        stats["conv1_2"] = absmax(y)
        y = conv2d(bb["conv1_2"], y)
        y = max_pool(y)
    stats["conv2_1"] = absmax(y)

    plan = body_plan(config)
    for (name, stride, dilation, is_tap, pool_after), nxt in zip(
        plan, plan[1:] + [None]
    ):
        y = conv2d(bb[name], y, stride=stride, dilation=dilation)
        if is_tap:
            taps[name] = y
        if nxt is not None:
            stats[nxt[0]] = absmax(y)
        if pool_after:
            y = max_pool(y)
    return taps, stats


def calibrate_act_scales(
    params: Dict,
    batches,
    config: ModelConfig,
    jit: bool = True,
) -> Dict[str, float]:
    """Run the stats forward over an iterable of normalized image batches
    (each (B, H, W, 3) in the compute dtype) and return per-tensor
    activation scales {name: absmax / 127}."""
    fn = collect_act_absmax
    if jit:
        fn = jax.jit(fn, static_argnums=(2,))
    running: Dict[str, float] = {}
    n = 0
    for x in batches:
        _, stats = fn(params, x, config)
        for k, v in stats.items():
            running[k] = max(running.get(k, 0.0), float(v))
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return {k: max(v, 1e-8) / 127.0 for k, v in running.items()}


# ---------------------------------------------------------------------------
# Parameter quantization
# ---------------------------------------------------------------------------


def quantize_detector_params(
    params: Dict, config: ModelConfig, act_scales: Dict[str, float]
) -> Dict:
    """Precompute the self-contained int8 inference pytree.

    Body convs carry {'kq' int8, 'deq' (co,) f32 = act_scale * w_scale,
    'bias' f32}; the packed conv1 block carries the bf16-side conv1_1'
    pieces plus the quantized packed conv1_2'.  LFPN/heads/L2Norm
    subtrees pass through untouched (they run bf16).
    """
    missing = [
        k for k in act_scale_names(config) if k not in act_scales
    ]
    if missing:
        raise ValueError(f"act_scales missing keys: {missing}")
    bb = params["backbone"]
    q: Dict = {
        "act": {k: jnp.float32(v) for k, v in act_scales.items()},
        "body": {},
        "lfpn": params["lfpn"],
        "heads": params["heads"],
        "l2norm": params["l2norm"],
    }
    # conv1 block: packed kernels precomputed once (the bf16 graph builds
    # them at trace time from the raw params; here they are data).
    k1p = _pack_conv_kernel_stride2(
        bb["conv1_1"]["kernel"].astype(jnp.float32)
    )
    k2p = _pack_conv_kernel_2x2_phase(
        bb["conv1_2"]["kernel"].astype(jnp.float32)
    )
    k2q, k2s = _quantize_kernel(k2p)
    q["conv1"] = {
        "k1p": k1p,
        "b1": jnp.tile(bb["conv1_1"]["bias"], 4).astype(jnp.float32),
        # raw conv1_1/conv1_2 kept for the odd-sized (unpacked) fallback
        "conv1_1": bb["conv1_1"],
        "conv1_2": bb["conv1_2"],
        "k2q": k2q,
        "k2_deq": k2s * jnp.float32(act_scales["conv1_2"]),
        "b2": bb["conv1_2"]["bias"].astype(jnp.float32),
    }
    for name, *_ in body_plan(config):
        kq, ws = _quantize_kernel(bb[name]["kernel"])
        q["body"][name] = {
            "kq": kq,
            "deq": ws * jnp.float32(act_scales[name]),
            "bias": bb[name]["bias"].astype(jnp.float32),
        }
    return q


# ---------------------------------------------------------------------------
# Quantized forward
# ---------------------------------------------------------------------------


def _quant_vgg_forward(
    q: Dict, x: jnp.ndarray, config: ModelConfig
) -> Dict[str, jnp.ndarray]:
    """int8 body; returns the six taps in the compute dtype."""
    act = q["act"]
    dt = x.dtype
    taps: Dict[str, jnp.ndarray] = {}
    packed = (
        config.conv1_packed and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    )
    c1 = q["conv1"]
    if packed:
        o1 = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x,
                c1["k1p"].astype(dt),
                (2, 2),
                ((1, 2), (1, 2)),
                dimension_numbers=_DN,
            )
            + c1["b1"].astype(dt)
        )
        q8 = _quantize_act(o1.astype(jnp.float32), act["conv1_2"])
        acc = _conv_i8(q8, c1["k2q"], padding=((1, 1), (1, 1)))
        r = acc.astype(jnp.float32) * c1["k2_deq"]
        s = _phase_slices(r, c1["b2"].shape[0])
        m = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
        y = jax.nn.relu(m + c1["b2"])
    else:
        y = conv2d(c1["conv1_1"], x)
        y = conv2d(c1["conv1_2"], y)
        y = max_pool(y).astype(jnp.float32)
    q8 = _quantize_act(y, act["conv2_1"])

    plan = body_plan(config)
    for (name, stride, dilation, is_tap, pool_after), nxt in zip(
        plan, plan[1:] + [None]
    ):
        lw = q["body"][name]
        acc = _conv_i8(q8, lw["kq"], stride=stride, dilation=dilation)
        y = jax.nn.relu(acc.astype(jnp.float32) * lw["deq"] + lw["bias"])
        if is_tap:
            taps[name] = y.astype(dt)
        if nxt is not None:
            q8 = _quantize_act(y, act[nxt[0]])
            if pool_after:
                q8 = _max_pool_i8(q8)
    return taps


def quantized_detector_forward(
    qparams: Dict,
    images: jnp.ndarray,
    config: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detector_forward's int8-body twin: (B, H, W, 3) normalized images
    -> (cls_logits (B, A, 2) f32, loc_preds (B, A, 4) f32)."""
    x = images.astype(jnp.dtype(config.compute_dtype))
    taps = _quant_vgg_forward(qparams, x, config)
    taps = lfpn_forward(qparams["lfpn"], taps, config)
    for name in config.l2norm_taps:
        taps[name] = l2_normalize(qparams["l2norm"][name], taps[name])
    return heads_forward(qparams["heads"], taps, config)
