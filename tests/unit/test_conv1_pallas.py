"""Parity tests for the fused packed-conv1_2 + phase-pool Pallas kernel.

The kernel (ops/conv1_pallas.py) must reproduce the XLA packed conv1
block (models/vgg.py::conv1_block_packed) — itself parity-tested against
the standard conv path — up to f32 accumulation order.  Runs in
interpret mode on the CPU test mesh; the TPU-compiled path is covered by
bench/profile runs (BASELINE.md r2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dan_tpu.models.vgg import conv1_block_packed


def _params(rng):
    def conv(ci, co):
        return {
            "kernel": jnp.asarray(
                rng.normal(0, 0.08, (3, 3, ci, co)).astype(np.float32)
            ),
            "bias": jnp.asarray(rng.normal(0, 0.1, (co,)).astype(np.float32)),
        }

    return {"conv1_1": conv(3, 64), "conv1_2": conv(64, 64)}


class TestConv1PallasParity:
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 32, 32, 3),  # W=16: minimum width, 2 images
            (1, 16, 48, 3),  # H=8: single-tile (T==1) path
            (1, 64, 64, 3),  # multi-tile rows
            (1, 32, 80, 3),  # W=40: Wp rounding exercises the pad tail
        ],
    )
    def test_matches_packed_xla(self, shape):
        rng = np.random.default_rng(7)
        from dan_tpu.ops.conv1_pallas import conv1_block_packed_pallas

        p = _params(rng)
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        want = np.asarray(
            conv1_block_packed(p, x.astype(jnp.bfloat16)), np.float32
        )
        got = np.asarray(conv1_block_packed_pallas(p, x, interpret=True),
                         np.float32)
        assert got.shape == want.shape == (
            shape[0], shape[1] // 2, shape[2] // 2, 64,
        )
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)

    @pytest.mark.parametrize("to_rows,n_slabs", [(8, 1), (8, 2), (16, 4)])
    def test_tile_and_slab_invariance(self, to_rows, n_slabs):
        """Output must not depend on the tiling/slab partition."""
        rng = np.random.default_rng(3)
        from dan_tpu.models.vgg import _pack_conv_kernel_2x2_phase
        from dan_tpu.ops.conv1_pallas import conv12_pool_pallas

        p = _params(rng)
        w_cat = _pack_conv_kernel_2x2_phase(
            p["conv1_2"]["kernel"]
        ).reshape(1024, 256)
        o1 = jnp.asarray(
            rng.normal(0, 1, (1, 32, 24, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)
        base = np.asarray(
            conv12_pool_pallas(
                o1, w_cat, p["conv1_2"]["bias"], interpret=True
            ),
            np.float32,
        )
        var = np.asarray(
            conv12_pool_pallas(
                o1,
                w_cat,
                p["conv1_2"]["bias"],
                to_rows=to_rows,
                n_slabs=n_slabs,
                interpret=True,
            ),
            np.float32,
        )
        np.testing.assert_array_equal(base, var)

    def test_negative_bias_relu_boundary(self):
        """Zero-frame columns must come out as relu(bias), exactly like
        the conv's own zero padding — a wrong frame would shift edges."""
        rng = np.random.default_rng(11)
        from dan_tpu.ops.conv1_pallas import conv1_block_packed_pallas

        p = _params(rng)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        got = np.asarray(conv1_block_packed_pallas(p, x, interpret=True))
        want = np.asarray(conv1_block_packed(p, x.astype(jnp.bfloat16)))
        np.testing.assert_allclose(got, want, atol=1e-3)

    @pytest.mark.parametrize(
        "shape",
        [
            (2, 32, 32, 3),  # W=16: minimum width, 2 images
            (1, 16, 48, 3),  # H=8: single-tile (T==1) path
            (1, 64, 64, 3),  # multi-tile rows
            (1, 32, 80, 3),  # W=40: Wp rounding exercises the pad tail
        ],
    )
    def test_v2_matches_packed_xla(self, shape):
        """v2 (conv1_1 fused in-kernel via the im2col input) must match
        the XLA packed block just like v1."""
        rng = np.random.default_rng(7)
        from dan_tpu.ops.conv1_pallas import conv1_block_packed_pallas_v2

        p = _params(rng)
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        want = np.asarray(
            conv1_block_packed(p, x.astype(jnp.bfloat16)), np.float32
        )
        got = np.asarray(
            conv1_block_packed_pallas_v2(p, x, interpret=True), np.float32
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)

    def test_im2col_channel_order(self):
        """im2col patches @ packed kernel == the stride-2 packed conv:
        locks the (wy*4+wx)*3+c channel convention both sides assume."""
        rng = np.random.default_rng(13)
        from dan_tpu.models.vgg import _pack_conv_kernel_stride2
        from dan_tpu.ops.conv1_pallas import _im2col_s2

        k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)).astype(np.float32))
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 20, 3)).astype(np.float32))
        kp = _pack_conv_kernel_stride2(k)
        want = jax.lax.conv_general_dilated(
            x, kp, (2, 2), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        im = _im2col_s2(x.astype(jnp.float32))
        assert im.shape[-1] == 128  # lane-alignment pad; 48.. must be zero
        np.testing.assert_array_equal(np.asarray(im[..., 48:]), 0.0)
        got = im[..., :48] @ kp.reshape(48, 256)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_v2_zero_input_edges(self):
        """Zero image: output must equal the XLA path exactly (exercises
        the re-zeroed pad columns and boundary rows in v2)."""
        rng = np.random.default_rng(11)
        from dan_tpu.ops.conv1_pallas import conv1_block_packed_pallas_v2

        p = _params(rng)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        got = np.asarray(conv1_block_packed_pallas_v2(p, x, interpret=True))
        want = np.asarray(conv1_block_packed(p, x.astype(jnp.bfloat16)))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_inference_dispatch_cpu_falls_back(self):
        """On non-TPU backends vgg_forward(for_inference=True) must use
        the XLA path (the compiled Pallas kernel is TPU-only)."""
        rng = np.random.default_rng(5)
        from dan_tpu.config import default_config
        from dan_tpu.models.vgg import init_vgg_params, vgg_forward

        cfg = default_config().model
        params = init_vgg_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
        t_inf = vgg_forward(params, x.astype(jnp.bfloat16), cfg, True)
        t_std = vgg_forward(params, x.astype(jnp.bfloat16), cfg, False)
        for k in t_std:
            np.testing.assert_array_equal(
                np.asarray(t_inf[k], np.float32), np.asarray(t_std[k], np.float32)
            )
