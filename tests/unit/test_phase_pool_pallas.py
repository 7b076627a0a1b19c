"""Phase-pool backward Pallas kernel vs the XLA pad+concat twin
(interpret mode on CPU) — bit-exact assembly, and end-to-end gradient
parity through the packed conv1 block's custom VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dan_tpu.ops.phase_pool_pallas as ppp
from dan_tpu.models.vgg import (
    _phase_pool_bwd_xla,
    conv1_block_packed,
    init_vgg_params,
)
from dan_tpu.config import ModelConfig
from dan_tpu.ops.phase_pool_pallas import phase_pool_bwd_pallas


def _random_case(key, b, h, w, c, dtype):
    kg, kw, kr = jax.random.split(key, 3)
    g = jax.random.normal(kg, (b, h, w, c), dtype)
    # Winner indices 0..3 plus the relu-clamped 255 sentinel.
    win = jax.random.randint(kw, (b, h, w, c), 0, 5).astype(jnp.uint8)
    win = jnp.where(win == 4, jnp.uint8(255), win)
    return g, win


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,h,w,c", [(2, 6, 6, 8), (1, 5, 7, 16), (3, 8, 4, 8)])
def test_kernel_matches_xla_assembly(dtype, b, h, w, c):
    g, win = _random_case(jax.random.PRNGKey(0), b, h, w, c, dtype)
    want = _phase_pool_bwd_xla(win, g)
    got = phase_pool_bwd_pallas(g, win, interpret=True)
    assert got.shape == (b, h + 1, w + 1, 4 * c)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "b,bblk",
    [
        (32, 16),  # the b32 train shape that compile-OOM'd the 1-D grid
        (24, 12),  # largest divisor <= 16 wins even when not 8-aligned
        (17, 1),  # prime: worst-case block (still correct, 17 blocks)
    ],
)
def test_kernel_batch_blocked_path(b, bblk):
    """b > 16 takes the (nb, H+1) grid with batch outermost; the scratch
    row-carry must stay correct across the per-block row sweeps (at each
    block's y=0 the slot holds the PREVIOUS block's last row — masked)."""
    import dan_tpu.ops.phase_pool_pallas as mod

    assert b > 16 and max(
        k for k in range(1, 17) if b % k == 0
    ) == bblk  # pin the block-size rule this test exercises
    g, win = _random_case(jax.random.PRNGKey(7), b, 6, 5, 8, jnp.bfloat16)
    want = _phase_pool_bwd_xla(win, g)
    got = mod.phase_pool_bwd_pallas(g, win, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_all_clamped_winner_gives_zero_cotangent():
    g = jnp.ones((2, 4, 4, 8), jnp.float32)
    win = jnp.full((2, 4, 4, 8), 255, jnp.uint8)
    got = phase_pool_bwd_pallas(g, win, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_island_assembly_bit_parity_on_mesh(monkeypatch):
    """Multi-chip configuration: the Pallas backward inside a shard_map
    island over the ('data',) mesh (what a real v5e-8 runs compiled) must
    assemble a bit-identical cotangent — mirrors the matcher/TTA island
    tests on the 8-device CPU mesh."""
    from jax.sharding import PartitionSpec as P

    from dan_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(ppp, "INTERPRET", True)
    mesh = make_mesh()
    n = mesh.devices.size
    assert n > 1, "conftest must provide the virtual multi-device CPU mesh"
    g, win = _random_case(jax.random.PRNGKey(3), n, 8, 8, 8, jnp.float32)
    want = _phase_pool_bwd_xla(win, g)
    axis = mesh.axis_names[0]
    got = jax.shard_map(
        phase_pool_bwd_pallas,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(g, win)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_island_assembly_blocked_batch_on_mesh(monkeypatch):
    """Per-shard batch > 16 under shard_map: each shard independently takes
    the batch-blocked (nb, H+1) grid — the single-chip b32 configuration
    scaled out (global b = 8 chips x 24/shard here)."""
    from jax.sharding import PartitionSpec as P

    from dan_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(ppp, "INTERPRET", True)
    mesh = make_mesh()
    n = mesh.devices.size
    g, win = _random_case(jax.random.PRNGKey(5), n * 24, 5, 4, 8, jnp.bfloat16)
    want = _phase_pool_bwd_xla(win, g)
    axis = mesh.axis_names[0]
    got = jax.shard_map(
        phase_pool_bwd_pallas,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(g, win)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_island_grad_close_on_mesh(monkeypatch):
    """End-to-end jax.grad through the packed conv1 block with the island
    backward: the custom-VJP + shard_map plumbing must produce the XLA
    twin's gradients.  Tolerance, not bit-equality: once the cotangent is
    mesh-sharded, the downstream conv grads run SPMD (per-shard partials
    + cross-device reduce), which changes f32 accumulation order."""
    from dan_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(ppp, "INTERPRET", True)
    mesh = make_mesh()
    n = mesh.devices.size
    cfg = ModelConfig()
    params = init_vgg_params(jax.random.PRNGKey(1), cfg)
    p1 = {k: params[k] for k in ("conv1_1", "conv1_2")}
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 16, 16, 3), jnp.float32)

    def loss(p, x, mode):
        return jnp.sum(conv1_block_packed(p, x, mode) ** 2)

    gx_xla, gp_xla = jax.grad(loss, argnums=(1, 0))(p1, x, False)
    island = (mesh, mesh.axis_names[0])
    gx_isl, gp_isl = jax.grad(loss, argnums=(1, 0))(p1, x, island)
    np.testing.assert_allclose(
        np.asarray(gx_xla), np.asarray(gx_isl), rtol=1e-4, atol=1e-4
    )
    for name in gp_xla:
        for leaf in gp_xla[name]:
            np.testing.assert_allclose(
                np.asarray(gp_xla[name][leaf]),
                np.asarray(gp_isl[name][leaf]),
                rtol=1e-4,
                atol=1e-4,
            )


def test_conv1_block_grad_parity_pallas_vs_xla(monkeypatch):
    """jax.grad through conv1_block_packed must be bit-identical with the
    Pallas backward (interpret mode) and the XLA assembly."""
    monkeypatch.setattr(ppp, "INTERPRET", True)
    cfg = ModelConfig()
    params = init_vgg_params(jax.random.PRNGKey(1), cfg)
    p1 = {k: params[k] for k in ("conv1_1", "conv1_2")}
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), jnp.float32)

    def loss(p, x, pallas_bwd):
        return jnp.sum(conv1_block_packed(p, x, pallas_bwd) ** 2)

    gx_xla, gp_xla = jax.grad(loss, argnums=(1, 0))(p1, x, False)
    gx_pl, gp_pl = jax.grad(loss, argnums=(1, 0))(p1, x, True)
    np.testing.assert_array_equal(np.asarray(gx_xla), np.asarray(gx_pl))
    for name in gp_xla:
        for leaf in gp_xla[name]:
            np.testing.assert_array_equal(
                np.asarray(gp_xla[name][leaf]), np.asarray(gp_pl[name][leaf])
            )
