"""Post-training int8 quantization (PTQ) of the inference path.

The reference (a TF1 research repo) has no quantized serving mode; this is
a beyond-parity deployment feature motivated by TPU hardware: the v5e MXU
executes s8 x s8 -> s32 at 2x the bf16 rate, and int8 activations halve
HBM traffic for the bandwidth-bound layers.  Measured end-to-end
(scripts/bench_int8.py --batch 128, 2026-08-20, BASELINE.md r5 rows):
bf16 451.25 -> int8 670.25 img/s/chip = 1.49x on the full b128 detect
graph on real v5e; the per-layer probe is scripts/probe_int8_conv.py.

Scheme (symmetric PTQ, per-channel on BOTH sides):
  * activations: per-CHANNEL symmetric int8 — the per-input-channel
    scale s_a[ci] folds into the consuming conv's weights BEFORE weight
    quantization (w~ = w * s_a[ci]), so the runtime graph is unchanged:
    quantize is an elementwise multiply by a (C,) vector, the conv is a
    plain s8 conv, and dequant stays one per-output-channel vector.
    (A first per-TENSOR-activation version lost 0.060 synthetic hard-AP
    vs bf16 — cross-channel range disparity crushed the resolution, the
    classic VGG PTQ failure; measured rows in BASELINE.md r5.)
  * weights: per-output-channel symmetric int8 on the FOLDED kernel,
    scale = absmax / 127; deq[co] = that scale (the act scale lives
    inside the folded weights);
  * every body conv computes s8 conv -> s32, dequantizes with deq[co],
    adds bias, relus, and requantizes for the next conv — the whole
    epilogue is one elementwise chain XLA fuses into the conv output;
  * max pools run ON int8: round(relu(y)/s) is monotone in y, so
    pool(quant(y)) == quant(pool(y)) exactly — pools never dequantize;
  * the phase-packed conv1 block keeps conv1_1' in bf16 (3 input
    channels starve the MXU; int8 buys nothing there) and quantizes the
    heavy conv1_2' (1.78x-FLOP packed conv); its f32 dequant+bias+relu+
    requant epilogue fuses INTO the conv output (emitting s8) and the
    phase-pool max runs on the requantized int8 — exact, because the
    requant function (bias, relu, next-layer scale) is SHARED across the
    four phase blocks (per-64-channel vectors tiled x4) and a shared
    monotone function commutes with max (a dequant-then-max f32
    formulation materialized the 4-byte accumulator and compile-OOM'd
    HBM at b128);
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
integer-math oracle on the conv path, stats-forward tap parity,
requant/max commutation, logits closeness vs the f32 graph) and at the
AP level by `scripts/smoke_e2e.py --int8` on real TPU — the measured
bf16-vs-int8 synthetic-AP delta is recorded in BASELINE.md (r5 row).
A deployment quantizing a real checkpoint should re-validate WIDER AP
with its own calibration set (SURVEY.md §0 — the reference ckpt/dataset
are not present here).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    """f32 activation -> symmetric int8; scale is a scalar or a
    per-channel (C,) vector (broadcast over the trailing channel dim)."""
    q = jnp.round(y * (1.0 / scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _quantize_kernel(k: jnp.ndarray, act_scale=None):
    """f32 (kh, kw, ci, co) -> (int8 kernel, (co,) f32 per-channel scale).

    act_scale: optional (ci,) per-input-channel activation scale FOLDED
    into the kernel before quantization (w~ = w * s_a[ci]); the returned
    per-co scale then already contains the activation side, so the
    runtime dequant stays one (co,) vector."""
    k = k.astype(jnp.float32)
    if act_scale is not None:
        k = k * jnp.asarray(act_scale, jnp.float32)[None, None, :, None]
    s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
    return q, s


def _conv_i8(x_q, k_q, stride=1, dilation=1, padding="SAME"):
    """s8 x s8 -> s32 conv.

    On TPU this is the native MXU path (s8 operands,
    preferred_element_type=s32 — the 2x-rate formulation the whole module
    exists for).  On the CPU backend XLA has NO vectorized integer conv:
    every s8/s16/s32-operand conv lowers to a scalar loop measured ~52x
    slower than the identical f32 conv (150 vs 2.9 ms on a 64^2x64x64
    3x3 — BASELINE.md r5), which turned the e2e CLI tests' 256-canvas
    detect into a >15-min hang.  The CPU twin below is EXACT, not
    approximate: split the kernel symmetrically into 4-bit halves
    k = 16*k_hi + k_lo with k_hi = floor((k+8)/16) in [-8, 8] and
    k_lo = k - 16*k_hi in [-8, 8), run both halves as f32 convs, and
    recombine in s32.  Every partial sum is an integer bounded by
    R*127*8 <= 4.69e6 for the largest reduction in the net
    (R = 3*3*512 = 4608 at fc6) — well under 2^24, so each f32
    accumulation is exact; the halves are cast back to s32 BEFORE the
    recombine add (whose result can exceed 2^24).  Pinned bitwise
    against the s8 formulation by
    tests/unit/test_quant.py::test_conv_cpu_twin_exact.
    """
    conv = lambda x, k, pt: jax.lax.conv_general_dilated(  # noqa: E731
        x,
        k,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
        preferred_element_type=pt,
    )
    if jax.default_backend() == "cpu":
        r = int(k_q.shape[0] * k_q.shape[1] * k_q.shape[2])
        if r * 127 * 8 < 2**24:  # exactness bound (always true in DAN)
            k32 = k_q.astype(jnp.int32)
            k_hi = (k32 + 8) >> 4  # floor((k+8)/16): symmetric split
            k_lo = k32 - (k_hi << 4)
            xf = x_q.astype(jnp.float32)
            acc_hi = conv(xf, k_hi.astype(jnp.float32), jnp.float32)
            acc_lo = conv(xf, k_lo.astype(jnp.float32), jnp.float32)
            return (acc_hi.astype(jnp.int32) << 4) + acc_lo.astype(
                jnp.int32
            )
    return conv(x_q, k_q, jnp.int32)


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
    (taps, {scale_name: per-CHANNEL absmax f32 (C,) vector}).

    Mirrors vgg_forward's inference path exactly — the taps are returned
    so tests can pin the mirror against the real forward bit-for-bit
    (test_quant.py::test_stats_forward_tap_parity).  Callers jit this per
    calibration batch and keep the running (elementwise) max.
    """
    bb = params["backbone"]
    stats: Dict[str, jnp.ndarray] = {}
    taps: Dict[str, jnp.ndarray] = {}

    def absmax(v):
        return jnp.max(jnp.abs(v.astype(jnp.float32)), axis=tuple(range(v.ndim - 1)))

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
) -> Dict[str, np.ndarray]:
    """Run the stats forward over an iterable of normalized image batches
    (each (B, H, W, 3) in the compute dtype) and return per-CHANNEL
    activation scales {name: (C,) absmax / 127}."""
    if jit:
        # Jit a stats-only wrapper so XLA dead-code-eliminates the six
        # full-resolution tap outputs (only the parity test needs them);
        # jitting collect_act_absmax whole would materialize and fetch
        # ~full-forward activations per calibration batch for nothing.
        fn = jax.jit(
            lambda p, x: collect_act_absmax(p, x, config)[1]
        )
        stats_of = lambda p, x: fn(p, x)  # noqa: E731
    else:
        stats_of = lambda p, x: collect_act_absmax(p, x, config)[1]  # noqa: E731
    running: Dict[str, np.ndarray] = {}
    n = 0
    for x in batches:
        stats = stats_of(params, x)
        for k, v in stats.items():
            v = np.asarray(v, np.float64)
            running[k] = (
                v if k not in running else np.maximum(running[k], v)
            )
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return {
        k: (np.maximum(v, 1e-8) / 127.0).astype(np.float32)
        for k, v in running.items()
    }


# ---------------------------------------------------------------------------
# Parameter quantization
# ---------------------------------------------------------------------------


def quantize_detector_params(
    params: Dict, config: ModelConfig, act_scales: Dict
) -> Dict:
    """Precompute the self-contained int8 inference pytree.

    act_scales: {name: (C,) per-channel activation scales} from
    calibrate_act_scales — folded into each consuming conv's kernel
    before per-output-channel weight quantization, so every body conv
    carries just {'kq' int8, 'deq' (co,) f32, 'bias' f32}; the packed
    conv1 block carries the bf16-side conv1_1' pieces plus the quantized
    packed conv1_2'.  LFPN/heads/L2Norm subtrees pass through untouched
    (they run bf16).
    """
    missing = [
        k for k in act_scale_names(config) if k not in act_scales
    ]
    if missing:
        raise ValueError(f"act_scales missing keys: {missing}")
    bb = params["backbone"]
    q: Dict = {
        "act": {
            k: jnp.asarray(v, jnp.float32) for k, v in act_scales.items()
        },
        "body": {},
        "lfpn": params["lfpn"],
        "heads": params["heads"],
        "l2norm": params["l2norm"],
    }
    # conv1 block: packed kernels precomputed once (the bf16 graph builds
    # them at trace time from the raw params; here they are data).  The
    # (256,) o1 activation scale folds into the packed conv1_2' kernel's
    # input channels like any body conv; the per-co deq that falls out
    # is NOT phase-invariant (different phases consume different input
    # phase channels), and does not need to be — the int8 phase max only
    # requires the REQUANT side (b2, next scale) to be shared across
    # phases, which the tile(..., 4) broadcasts guarantee (see
    # _quant_vgg_forward).
    k1p = _pack_conv_kernel_stride2(
        bb["conv1_1"]["kernel"].astype(jnp.float32)
    )
    k2p = _pack_conv_kernel_2x2_phase(
        bb["conv1_2"]["kernel"].astype(jnp.float32)
    )
    k2q, k2s = _quantize_kernel(k2p, act_scale=act_scales["conv1_2"])
    q["conv1"] = {
        "k1p": k1p,
        "b1": jnp.tile(bb["conv1_1"]["bias"], 4).astype(jnp.float32),
        # raw conv1_1/conv1_2 kept for the odd-sized (unpacked) fallback
        "conv1_1": bb["conv1_1"],
        "conv1_2": bb["conv1_2"],
        "k2q": k2q,
        "k2_deq": k2s,
        "b2": bb["conv1_2"]["bias"].astype(jnp.float32),
    }
    for name, *_ in body_plan(config):
        kq, ws = _quantize_kernel(
            bb[name]["kernel"], act_scale=act_scales[name]
        )
        q["body"][name] = {
            "kq": kq,
            "deq": ws,
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
        # Fused f32 epilogue per phase channel, requantized to s8 INSIDE
        # the conv output fusion; the phase max then runs on int8.  Exact
        # vs dequant-then-max: z is each phase's correct f32 pre-pool
        # value, and the function applied to it — round(relu(z + b)/s) —
        # is monotone in z with b and s SHARED across phases (per-64
        # vectors tiled x4 here), so max and requant commute — same
        # argument as _max_pool_i8.  Materializes 1 byte/elem instead of
        # 4 (the f32 formulation compile-OOM'd HBM at batch 128).
        z = acc.astype(jnp.float32) * c1["k2_deq"] + jnp.tile(c1["b2"], 4)
        q_all = _quantize_act(jax.nn.relu(z), jnp.tile(act["conv2_1"], 4))
        s = _phase_slices(q_all, c1["b2"].shape[0])
        q8 = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
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
