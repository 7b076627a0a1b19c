"""Model tests: output shapes match anchor counts, param counts sane,
jit compiles, bf16/f32 discipline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.box.anchors import generate_anchors_np, layer_anchor_counts
from dan_tpu.config import ModelConfig, AnchorConfig
from dan_tpu.models import (
    count_params,
    detector_forward,
    init_detector_params,
)

# Small image keeps the CPU test fast; all strides still produce >=1 cell.
SIZE = 64
MCFG = ModelConfig(image_size=SIZE, compute_dtype="float32")
ACFG = AnchorConfig()


@pytest.fixture(scope="module")
def params():
    return init_detector_params(jax.random.PRNGKey(0), MCFG)


class TestDetector:
    def test_output_shapes_match_anchors(self, params):
        x = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
        cls, loc = detector_forward(params, x, MCFG)
        num_anchors = generate_anchors_np(ACFG, SIZE, SIZE).shape[0]
        assert cls.shape == (2, num_anchors, 2)
        assert loc.shape == (2, num_anchors, 4)
        assert cls.dtype == jnp.float32 and loc.dtype == jnp.float32

    def test_per_layer_counts(self):
        counts = layer_anchor_counts(ACFG, SIZE, SIZE)
        assert counts == (16 * 16, 8 * 8, 4 * 4, 2 * 2, 1 * 1, 1 * 1)

    def test_param_count_range(self, params):
        n = count_params(params)
        # VGG-16 convs (~14.7M) + fc6/fc7 (~5.8M) + extras + LFPN + heads.
        assert 20e6 < n < 30e6, n

    def test_param_shapes(self, params):
        bb = params["backbone"]
        assert bb["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
        assert bb["fc6"]["kernel"].shape == (3, 3, 512, 1024)
        assert bb["fc7"]["kernel"].shape == (1, 1, 1024, 1024)
        assert bb["conv6_2"]["kernel"].shape == (3, 3, 256, 512)
        assert bb["conv7_2"]["kernel"].shape == (3, 3, 128, 256)
        # Max-in-out head on stride-4: 3 bg + 1 face channels.
        assert params["heads"]["cls_conv3_3"]["kernel"].shape[-1] == 4
        assert params["heads"]["cls_conv4_3"]["kernel"].shape[-1] == 2
        # L2Norm scales init.
        np.testing.assert_allclose(
            np.asarray(params["l2norm"]["conv3_3"]["scale"])[:3], 10.0
        )

    def test_jit_and_finite(self, params):
        f = jax.jit(lambda p, x: detector_forward(p, x, MCFG))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))
        cls, loc = f(params, x)
        assert np.isfinite(np.asarray(cls)).all()
        assert np.isfinite(np.asarray(loc)).all()

    def test_bf16_compute_path(self, params):
        cfg16 = ModelConfig(image_size=SIZE, compute_dtype="bfloat16")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))
        cls, loc = detector_forward(params, x, cfg16)
        assert cls.dtype == jnp.float32  # logits promoted back to f32
        assert np.isfinite(np.asarray(cls)).all()

    def test_translation_covariance_smoke(self, params):
        """A fully-conv detector's outputs shift with the input (modulo
        padding effects) — catches accidental spatial flattening bugs.

        Runs at 128px (params are size-agnostic): at 64px the LFPN top-down
        path from the 1x1/2x2 deep maps couples all positions globally, so
        no interior is shift-clean.
        """
        size = 128
        cfg = ModelConfig(image_size=size, compute_dtype="float32")
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (1, size, size, 3))
        # Shift by one stride-4 cell.
        x_shift = jnp.roll(x, shift=4, axis=2)
        cls, _ = detector_forward(params, x, cfg)
        cls_s, _ = detector_forward(params, x_shift, cfg)
        # Layer 0 grid is 32x32: rolling input by 4px rolls the grid by 1.
        g = np.asarray(cls[0, : 32 * 32, 1]).reshape(32, 32)
        gs = np.asarray(cls_s[0, : 32 * 32, 1]).reshape(32, 32)
        # Compare interior (away from padding).
        np.testing.assert_allclose(
            gs[8:-8, 9:-8], np.roll(g, 1, axis=1)[8:-8, 9:-8], rtol=0.15, atol=0.15
        )


class TestPackedConv1:
    """Phase-packed conv1 block (models/vgg.py::conv1_block_packed) must be
    mathematically identical to the standard conv->conv->pool path."""

    def test_block_parity_f32(self, rng):
        from dan_tpu.models.layers import conv2d, max_pool
        from dan_tpu.models.vgg import conv1_block_packed, init_vgg_params

        vgg = init_vgg_params(jax.random.PRNGKey(1), MCFG)
        for h, w in [(64, 64), (48, 80), (34, 62)]:
            x = jnp.asarray(rng.normal(0, 50, (2, h, w, 3)).astype(np.float32))
            std = max_pool(conv2d(vgg["conv1_2"], conv2d(vgg["conv1_1"], x)))
            packed = conv1_block_packed(vgg, x)
            np.testing.assert_allclose(
                np.asarray(packed), np.asarray(std), rtol=2e-5, atol=1e-3
            )

    def test_full_forward_parity(self, rng):
        import dataclasses

        x = jnp.asarray(rng.normal(0, 50, (2, SIZE, SIZE, 3)).astype(np.float32))
        p_on = init_detector_params(jax.random.PRNGKey(0), MCFG)
        cfg_off = dataclasses.replace(MCFG, conv1_packed=False)
        cls_a, loc_a = jax.jit(
            lambda p, x: detector_forward(p, x, MCFG)
        )(p_on, x)
        cls_b, loc_b = jax.jit(
            lambda p, x: detector_forward(p, x, cfg_off)
        )(p_on, x)
        np.testing.assert_allclose(
            np.asarray(cls_a), np.asarray(cls_b), rtol=1e-4, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(loc_a), np.asarray(loc_b), rtol=1e-4, atol=2e-3
        )

    def test_odd_size_falls_back(self, rng):
        # Odd H/W: packed path must be skipped, not crash.
        x = jnp.asarray(rng.normal(0, 50, (1, 63, 65, 3)).astype(np.float32))
        p = init_detector_params(jax.random.PRNGKey(0), MCFG)
        cls, loc = detector_forward(p, x, MCFG)
        assert np.isfinite(np.asarray(cls)).all()

    def test_packed_grads_match_standard_path(self, rng):
        """The hand-written _phase_pool VJP must produce the same parameter
        gradients as autodiff of the standard conv->conv->pool path."""
        from dan_tpu.models.layers import conv2d, max_pool
        from dan_tpu.models.vgg import conv1_block_packed, init_vgg_params

        vgg = init_vgg_params(jax.random.PRNGKey(1), MCFG)
        p = {"conv1_1": vgg["conv1_1"], "conv1_2": vgg["conv1_2"]}
        x = jnp.asarray(rng.normal(0, 50, (2, 32, 32, 3)).astype(np.float32))

        def loss_std(p):
            return jnp.sum(
                max_pool(conv2d(p["conv1_2"], conv2d(p["conv1_1"], x))) ** 2
            )

        def loss_packed(p):
            return jnp.sum(conv1_block_packed(p, x) ** 2)

        gs = jax.grad(loss_std)(p)
        gp = jax.grad(loss_packed)(p)
        for name in ("conv1_1", "conv1_2"):
            for leaf in ("kernel", "bias"):
                a, b = np.asarray(gs[name][leaf]), np.asarray(gp[name][leaf])
                np.testing.assert_allclose(
                    a, b, rtol=5e-4, atol=5e-3 * np.abs(a).max()
                )

    def test_grad_flows_through_packed_kernels(self, rng):
        from dan_tpu.models.vgg import conv1_block_packed, init_vgg_params

        vgg = init_vgg_params(jax.random.PRNGKey(1), MCFG)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 3)).astype(np.float32))

        def loss(k):
            v = dict(vgg)
            v["conv1_1"] = {"kernel": k, "bias": vgg["conv1_1"]["bias"]}
            return jnp.sum(conv1_block_packed(v, x) ** 2)

        g = jax.grad(loss)(vgg["conv1_1"]["kernel"])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0

