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
    assert all(float(v) >= 0 for v in stats.values())


def test_calibrate_and_quantize_shapes(params, images):
    scales = calibrate_act_scales(params, [images], MCFG)
    assert set(scales) == set(act_scale_names(MCFG))
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
