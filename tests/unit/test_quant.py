"""int8 PTQ path (dan_tpu/quant.py): integer-math exactness, the
calibration mirror's tap parity with the real forward, pool/quantize
commutation, end-to-end logits closeness, and the Detector surface."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.detector import init_detector_params
from dan_tpu.models.vgg import vgg_forward
from dan_tpu.quant import (
    _conv_i8,
    _max_pool_i8,
    _quantize_act,
    act_scale_names,
    body_plan,
    calibrate_act_scales,
    collect_act_absmax,
    quantize_detector_params,
    quantized_detector_forward,
)

SIZE = 64
MCFG = ModelConfig(image_size=SIZE, compute_dtype="float32")


@pytest.fixture(scope="module")
def params():
    return init_detector_params(jax.random.PRNGKey(0), MCFG)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    # Mean-subtracted-pixel-like range.
    return jnp.asarray(
        rng.uniform(-120.0, 130.0, (2, SIZE, SIZE, 3)), jnp.float32
    )


def test_body_plan_structure():
    plan = body_plan(MCFG)
    names = [n for n, *_ in plan]
    assert names[0] == "conv2_1" and names[-1] == "conv7_2"
    assert "fc6" in names and "fc7" in names
    taps = [n for n, _, _, t, _ in plan if t]
    assert taps == ["conv3_3", "conv4_3", "conv5_3", "fc7", "conv6_2", "conv7_2"]
    # pools end exactly the VGG blocks 2-5
    pools = [n for n, _, _, _, p in plan if p]
    assert pools == ["conv2_2", "conv3_3", "conv4_3", "conv5_3"]
    # dilation only on fc6; stride 2 only on the extra-block 3x3s
    assert [n for n, _, d, _, _ in plan if d != 1] == ["fc6"]
    assert [n for n, s, _, _, _ in plan if s != 1] == ["conv6_2", "conv7_2"]


def test_int8_conv_integer_exact(rng):
    """_conv_i8 == exact integer numpy correlation (no hidden rescaling)."""
    x = rng.integers(-127, 128, (2, 9, 9, 5)).astype(np.int8)
    w = rng.integers(-127, 128, (3, 3, 5, 4)).astype(np.int8)
    out = np.asarray(_conv_i8(jnp.asarray(x), jnp.asarray(w)))
    xp = np.pad(x.astype(np.int64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 9, 9, 4), np.int64)
    for dy in range(3):
        for dx in range(3):
            ref += np.einsum(
                "bhwc,cd->bhwd",
                xp[:, dy : dy + 9, dx : dx + 9, :],
                w[dy, dx].astype(np.int64),
            )
    np.testing.assert_array_equal(out, ref.astype(np.int32))


def test_conv_cpu_twin_exact(rng):
    """On the CPU backend _conv_i8 dispatches to the hi/lo 4-bit f32-split
    twin (XLA:CPU integer convs are ~52x slower than f32 — BASELINE.md
    r5).  Pin it bitwise against the raw s8-operand formulation at the
    net's WORST-CASE reduction (fc6: R = 3*3*512 = 4608, the largest
    f32-accumulation bound) with adversarial +/-127 values, dilation
    included."""
    assert jax.default_backend() == "cpu"
    x = rng.integers(-127, 128, (1, 8, 8, 512)).astype(np.int8)
    # bias toward extremes so sums approach the documented bound
    x[0, :4] = 127
    x[0, 4:, :, ::2] = -127
    w = rng.integers(-127, 128, (3, 3, 512, 8)).astype(np.int8)
    w[:, :, ::3] = 127
    w[:, :, 1::3] = -127
    from dan_tpu.quant import _DN

    def s8_formulation(xq, kq, dilation):
        return jax.lax.conv_general_dilated(
            xq,
            kq,
            window_strides=(1, 1),
            padding="SAME",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )

    for dil in (1, 3):
        twin = _conv_i8(jnp.asarray(x), jnp.asarray(w), dilation=dil)
        ref = s8_formulation(jnp.asarray(x), jnp.asarray(w), dil)
        assert twin.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(twin), np.asarray(ref))


def test_pool_quantize_commute(rng):
    """pool(quant(y)) == quant(pool(y)): requant is monotone, so pooling
    runs on int8 without any accuracy change."""
    y = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    y = jax.nn.relu(y)
    s = 0.013
    a = _max_pool_i8(_quantize_act(y, s))
    from dan_tpu.models.layers import max_pool

    b = _quantize_act(max_pool(y), s)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_phase_requant_max_commute(params, images, rng):
    """The packed conv1 epilogue requantizes to s8 INSIDE the conv fusion
    and phase-maxes on int8 (the b128 HBM-OOM fix).  Exactness needs the
    REQUANT side (bias + next-layer act scale) shared across the four
    phase blocks — the dequant vector may differ per phase (it does,
    with per-channel act folding) because it only produces each phase's
    correct f32 value BEFORE the shared monotone requant.  Checked
    bitwise against the dequant-then-max f32 oracle on the real conv1
    pieces."""
    from dan_tpu.models.vgg import _phase_slices
    from dan_tpu.quant import calibrate_act_scales

    scales = calibrate_act_scales(params, [images], MCFG)
    q = quantize_detector_params(params, MCFG, scales)
    c1 = q["conv1"]
    co = c1["b2"].shape[0]
    s_next = jnp.asarray(scales["conv2_1"], jnp.float32)
    assert s_next.shape == (co,)
    acc = jnp.asarray(
        rng.integers(-(2**20), 2**20, (2, 9, 9, 4 * co)), jnp.int32
    )
    # the forward's formulation: per-phase epilogue, quantize, int8 max
    z = acc.astype(jnp.float32) * c1["k2_deq"] + jnp.tile(c1["b2"], 4)
    q_all = _quantize_act(jax.nn.relu(z), jnp.tile(s_next, 4))
    s8 = _phase_slices(q_all, co)
    ours = jnp.maximum(jnp.maximum(s8[0], s8[1]), jnp.maximum(s8[2], s8[3]))
    # oracle: dequant -> phase max -> bias+relu -> quantize (f32 path)
    r = _phase_slices(acc.astype(jnp.float32) * c1["k2_deq"], co)
    m = jnp.maximum(jnp.maximum(r[0], r[1]), jnp.maximum(r[2], r[3]))
    ref = _quantize_act(jax.nn.relu(m + c1["b2"]), s_next)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_stats_forward_tap_parity(params, images):
    """The calibration mirror must track vgg_forward bit-for-bit — it is
    the source of the activation ranges the quantized graph clips to."""
    taps_ref = vgg_forward(
        params["backbone"], images, MCFG, for_inference=True
    )
    taps_mirror, stats = collect_act_absmax(params, images, MCFG)
    assert set(taps_mirror) == set(taps_ref)
    for name in taps_ref:
        np.testing.assert_array_equal(
            np.asarray(taps_ref[name]), np.asarray(taps_mirror[name]),
            err_msg=name,
        )
    assert set(stats) == set(act_scale_names(MCFG))
    for k, v in stats.items():
        assert v.ndim == 1 and bool(jnp.all(v >= 0)), k


def test_calibrate_and_quantize_shapes(params, images):
    scales = calibrate_act_scales(params, [images], MCFG)
    assert set(scales) == set(act_scale_names(MCFG))
    # per-channel: each scale is a (C,) vector sized to the consumed tensor
    assert scales["conv1_2"].shape == (256,)  # o1 = 4 phases x 64
    assert scales["conv2_1"].shape == (64,)
    assert scales["fc7"].shape == (1024,)
    assert all(v.ndim == 1 and (v > 0).all() for v in scales.values())
    q = quantize_detector_params(params, MCFG, scales)
    assert q["conv1"]["k2q"].dtype == jnp.int8
    for name, *_ in body_plan(MCFG):
        lw = q["body"][name]
        assert lw["kq"].dtype == jnp.int8
        assert lw["deq"].shape == (lw["kq"].shape[-1],)
        # per-channel weight quantization saturates the int8 range
        assert int(jnp.max(jnp.abs(lw["kq"]))) == 127
    missing = dict(scales)
    missing.pop("conv3_1")
    with pytest.raises(ValueError, match="conv3_1"):
        quantize_detector_params(params, MCFG, missing)


def test_quantized_forward_close_to_f32(params, images):
    """End-to-end: the int8 body's logits track the f32 graph.  PTQ noise
    compounds across the 15-conv body, LFPN products and L2Norm, so the
    bound is statistical (correlation) plus a scale-relative RMS bound."""
    from dan_tpu.models.detector import detector_forward

    scales = calibrate_act_scales(params, [images], MCFG)
    q = quantize_detector_params(params, MCFG, scales)
    cls_q, loc_q = jax.jit(
        quantized_detector_forward, static_argnums=(2,)
    )(q, images, MCFG)
    cls_f, loc_f = detector_forward(params, images, MCFG, for_inference=True)
    assert cls_q.shape == cls_f.shape and loc_q.shape == loc_f.shape
    assert bool(jnp.all(jnp.isfinite(cls_q))) and bool(
        jnp.all(jnp.isfinite(loc_q))
    )
    for a, b in ((cls_q, cls_f), (loc_q, loc_f)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        rel_rms = np.sqrt(np.mean((a - b) ** 2)) / (np.std(b) + 1e-9)
        assert corr > 0.99, corr
        assert rel_rms < 0.15, rel_rms


def test_quantized_body_sharded_bit_identical(params, images):
    """The int8 BODY under a data-sharded 8-device mesh must equal the
    single-device result BITWISE: int32 conv accumulation is exact and
    the f32 epilogues are per-element, so sharding cannot change values
    (no shard_map island needed — GSPMD partitions int8 convs natively).
    The bf16/f32 LFPN+heads tail is excluded: like every float conv, its
    reduction order may differ between compilations — the quant claim is
    about the integer body."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dan_tpu.quant import _quant_vgg_forward

    scales = calibrate_act_scales(params, [images], MCFG)
    q = quantize_detector_params(params, MCFG, scales)
    x8 = jnp.tile(images, (4, 1, 1, 1))  # batch 8 over 8 devices
    fn = jax.jit(_quant_vgg_forward, static_argnums=(2,))
    ref = fn(q, x8, MCFG)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    xs = jax.device_put(x8, NamedSharding(mesh, P("data")))
    qs = jax.device_put(q, NamedSharding(mesh, P()))
    out = fn(qs, xs, MCFG)
    assert set(ref) == set(out)
    for name in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[name]), np.asarray(out[name]), err_msg=name
        )


def test_detector_api_quantize(params):
    from dan_tpu.api import Detector

    rng = np.random.default_rng(3)
    import dataclasses

    from dan_tpu.config import default_config

    cfg = dataclasses.replace(default_config(), model=MCFG)
    det = Detector(params, cfg)
    imgs = [
        rng.integers(0, 255, (50, 70, 3), np.uint8),
        rng.integers(0, 255, (64, 64, 3), np.uint8),
        rng.integers(0, 255, (33, 21, 3), np.uint8),
    ]
    out_f = det.detect(imgs[0])
    scales = det.quantize_int8(imgs, batch_size=2)
    assert set(scales) == set(act_scale_names(MCFG))
    assert det._detect_fns == {}  # compiled bf16 fns dropped
    out_q = det.detect(imgs[0])
    for out in (out_f, out_q):
        assert out["bboxes"].shape[1] == 4
        assert np.all(np.isfinite(out["bboxes"]))
    # batch path runs on the quantized graph too
    outs = det.detect_batch(imgs[:2])
    assert len(outs) == 2


def test_detector_dequantize_and_tta_warning(params):
    """dequantize() must clear BOTH _quant and the compiled int8 closures
    (feeding f32 params into them crashes — the ADVICE r4 repro), and the
    bf16-only TTA path must warn exactly once on a quantized detector."""
    import dataclasses
    import warnings

    from dan_tpu.api import Detector
    from dan_tpu.config import default_config

    cfg = dataclasses.replace(default_config(), model=MCFG)
    det = Detector(params, cfg)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (48, 60, 3), np.uint8)
    det.quantize_int8([img], batch_size=1)
    det.detect(img)  # compiles an int8 closure into the cache

    # TTA warns once (stub runner: the warning is about the mode split,
    # not the TTA math, and compiling real TTA graphs here is minutes).
    class _Stub:
        def detect_tta(self, image):
            return {
                "bboxes": np.zeros((1, 4), np.float32),
                "scores": np.ones((1,), np.float32),
            }

    det._tta_runner = _Stub()
    with pytest.warns(UserWarning, match="bf16"):
        det.detect_tta(img)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        det.detect_tta(img)  # one-time: must not warn again

    det.dequantize()
    assert det._quant is None and det._detect_fns == {}
    out = det.detect(img)  # would KeyError 'act' if closures survived
    assert np.all(np.isfinite(out["bboxes"]))
