"""conv1_2' weight-grad Pallas kernel: interpret-mode parity vs the XLA
twin (jax.vjp of the conv), standalone and integrated through the packed
conv1 block's custom VJP (models/vgg.py::_conv12)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dan_tpu.ops.conv12_wgrad_pallas import conv12_wgrad_pallas


def _conv(o1, k):
    return jax.lax.conv_general_dilated(
        o1, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _oracle_wgrad(o1, dr, c):
    k2 = jnp.zeros((2, 2, c, c), o1.dtype)
    _, vjp = jax.vjp(lambda k: _conv(o1, k), k2)
    return vjp(dr)[0]


class TestKernel:
    @pytest.mark.parametrize(
        "b,h,w,c", [(8, 6, 10, 128), (16, 9, 5, 256), (8, 1, 1, 128)]
    )
    def test_matches_vjp_oracle(self, b, h, w, c, rng):
        o1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        dr = jnp.asarray(rng.normal(size=(b, h + 1, w + 1, c)), jnp.float32)
        want = np.asarray(_oracle_wgrad(o1, dr, c), np.float64)
        got = np.asarray(conv12_wgrad_pallas(o1, dr, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_bf16_inputs_f32_accumulate(self, rng):
        """Production dtype: bf16 operands, f32 accumulation — matches the
        f64 oracle within bf16 input rounding."""
        b, h, w, c = 8, 6, 6, 128
        o1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        dr = jnp.asarray(rng.normal(size=(b, h + 1, w + 1, c)), jnp.bfloat16)
        # f64 oracle via explicit taps (einsum over shifted windows).
        o1p = np.pad(np.asarray(o1, np.float64), ((0, 0), (1, 1), (1, 1), (0, 0)))
        drn = np.asarray(dr, np.float64)
        want = np.zeros((2, 2, c, c))
        for kh in range(2):
            for kw in range(2):
                want[kh, kw] = np.einsum(
                    "byxi,byxo->io",
                    o1p[:, kh : kh + h + 1, kw : kw + w + 1],
                    drn,
                    optimize=True,
                )
        got = np.asarray(
            conv12_wgrad_pallas(o1, dr, interpret=True), np.float64
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_relu_input_mode(self, rng):
        """relu_input=True == relu applied before the kernel."""
        b, h, w, c = 8, 5, 7, 128
        o1_pre = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        dr = jnp.asarray(rng.normal(size=(b, h + 1, w + 1, c)), jnp.float32)
        want = conv12_wgrad_pallas(jax.nn.relu(o1_pre), dr, interpret=True)
        got = conv12_wgrad_pallas(o1_pre, dr, interpret=True, relu_input=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rejects_unaligned_batch(self, rng):
        o1 = jnp.zeros((3, 4, 4, 128), jnp.float32)
        dr = jnp.zeros((3, 5, 5, 128), jnp.float32)
        with pytest.raises(AssertionError):
            conv12_wgrad_pallas(o1, dr, interpret=True)

    def test_edge_rows_zero_padded(self, rng):
        """The y = -1 / y = H padding rows contribute exactly zero: a
        cotangent placed only on the first/last spatial row reproduces the
        oracle (catches off-by-one in the row predicates)."""
        b, h, w, c = 8, 4, 4, 128
        o1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        for row in (0, h):
            dr = jnp.zeros((b, h + 1, w + 1, c), jnp.float32)
            dr = dr.at[:, row].set(
                jnp.asarray(rng.normal(size=(b, w + 1, c)), jnp.float32)
            )
            want = np.asarray(_oracle_wgrad(o1, dr, c), np.float64)
            got = np.asarray(conv12_wgrad_pallas(o1, dr, interpret=True))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


class TestIntegratedVJP:
    def _grads(self, wgrad_mode, x, params, interpret):
        from dan_tpu.models import vgg
        from dan_tpu.ops import conv12_wgrad_pallas as cwp

        old = cwp.INTERPRET
        cwp.INTERPRET = interpret
        try:
            def loss(p):
                out = vgg.conv1_block_packed(p, x, False, wgrad_mode)
                return jnp.sum(out * out)

            return jax.grad(loss)(params)
        finally:
            cwp.INTERPRET = old

    def test_custom_vjp_matches_autodiff(self, rng):
        """All three backward modes agree: plain conv (autodiff), custom
        VJP with the XLA twin, custom VJP with the Pallas kernel
        (interpret).  conv1_1 grads are bit-identical across modes (the
        dgrad formulation is shared); conv1_2 kernel grads are allclose
        (f32 accumulation order differs in the Pallas mode)."""
        params = {
            "conv1_1": {
                "kernel": jnp.asarray(rng.normal(size=(3, 3, 3, 4)) * 0.1,
                                      jnp.float32),
                "bias": jnp.zeros((4,), jnp.float32),
            },
            "conv1_2": {
                "kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 32)) * 0.1,
                                      jnp.float32),
                "bias": jnp.zeros((32,), jnp.float32),
            },
        }
        x = jnp.asarray(rng.normal(size=(8, 8, 8, 3)), jnp.float32)
        g_auto = self._grads(None, x, params, False)
        g_twin = self._grads(False, x, params, False)
        g_pl = self._grads(True, x, params, True)
        for name in ("conv1_1", "conv1_2"):
            for leaf in ("kernel", "bias"):
                np.testing.assert_array_equal(
                    np.asarray(g_auto[name][leaf]),
                    np.asarray(g_twin[name][leaf]),
                    err_msg=f"XLA-twin custom VJP drifted on {name}/{leaf}",
                )
        np.testing.assert_array_equal(
            np.asarray(g_pl["conv1_1"]["kernel"]),
            np.asarray(g_auto["conv1_1"]["kernel"]),
            err_msg="shared dgrad must be bit-identical in Pallas mode",
        )
        np.testing.assert_allclose(
            np.asarray(g_pl["conv1_2"]["kernel"]),
            np.asarray(g_auto["conv1_2"]["kernel"]),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_island_psum_matches_single(self, rng):
        """(Mesh, axis) mode: per-shard kernel + psum == full-batch grads
        on the virtual 8-device mesh (per-shard batch 8)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=8)
        params = {
            "conv1_1": {
                "kernel": jnp.asarray(rng.normal(size=(3, 3, 3, 4)) * 0.1,
                                      jnp.float32),
                "bias": jnp.zeros((4,), jnp.float32),
            },
            "conv1_2": {
                "kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 32)) * 0.1,
                                      jnp.float32),
                "bias": jnp.zeros((32,), jnp.float32),
            },
        }
        x = jnp.asarray(rng.normal(size=(64, 8, 8, 3)), jnp.float32)
        g_ref = self._grads(True, x, params, True)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        g_island = self._grads((mesh, "data"), xs, params, True)
        np.testing.assert_allclose(
            np.asarray(g_island["conv1_2"]["kernel"]),
            np.asarray(g_ref["conv1_2"]["kernel"]),
            rtol=1e-5,
            atol=1e-5,
        )
