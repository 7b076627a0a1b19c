"""E2E training smoke on the virtual 8-device CPU mesh (SURVEY.md §4
items 4-5): the full fused step (preprocess -> match -> forward -> loss ->
update) compiles, runs sharded, decreases loss, and is batch-size invariant
across mesh sizes."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.config import (
    DANConfig,
    MatchConfig,
    ModelConfig,
    PreprocessConfig,
    TrainConfig,
)
from dan_tpu.data.synthetic import synthetic_batch
from dan_tpu.parallel.mesh import make_mesh, shard_batch
from dan_tpu.train import create_train_state, make_sharded_train_step


def tiny_config() -> DANConfig:
    return DANConfig(
        model=ModelConfig(image_size=64, compute_dtype="float32"),
        preprocess=PreprocessConfig(train_image_size=64, canvas_size=128),
        match=MatchConfig(max_gt=8),
        train=TrainConfig(
            batch_size=8,
            learning_rate=1e-3,
            hnm_min_negatives=8,
            lr_boundaries=(1000,),
            lr_factors=(1.0, 0.1),
        ),
    )


@pytest.fixture(scope="module")
def setup():
    """cfg/mesh/step are shared; state must be created per test because the
    jitted step donates its input state buffers."""
    cfg = tiny_config()
    mesh = make_mesh()
    assert len(mesh.devices.flat) == 8, "conftest must force 8 CPU devices"
    step = make_sharded_train_step(cfg, mesh)
    return cfg, mesh, lambda: create_train_state(cfg, jax.random.PRNGKey(0)), step


class TestTrainStep:
    def test_loss_decreases(self, setup):
        cfg, mesh, make_state, step = setup
        state = make_state()
        batch = shard_batch(synthetic_batch(cfg, 8, seed=0), mesh)
        losses = []
        for i in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        assert float(metrics["num_pos"]) > 0

    def test_metrics_shapes_and_step(self, setup):
        cfg, mesh, make_state, step = setup
        state = make_state()
        batch = shard_batch(synthetic_batch(cfg, 8, seed=1), mesh)
        new_state, metrics = step(state, batch)  # donates `state`
        assert int(new_state.step) == 1
        for k in ("loss", "cls_loss", "loc_loss", "grad_norm"):
            assert np.isfinite(float(metrics[k])), k

    def test_all_padding_batch_finite(self, setup):
        """A batch with ZERO valid gt (every mask lane false) must produce
        a finite loss and finite param updates — the num_pos=0 path (HNM
        falls back to hnm_min_negatives; total_pos clamps to 1)."""
        cfg, mesh, mk_state, step = setup
        state = mk_state()
        batch = synthetic_batch(cfg, cfg.train.batch_size, seed=5)
        batch["mask"][:] = False
        batch["boxes"][:] = 0.0
        batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["num_pos"]) == 0.0
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestDPEquivalence:
    def test_1dev_vs_8dev_identical(self):
        """The standard fake-multi-device check: same global batch on a
        1-device and an 8-device mesh produces identical params."""
        cfg = tiny_config()
        batch = synthetic_batch(cfg, 8, seed=2)

        results = []
        for n in (1, 8):
            mesh = make_mesh(n_devices=n)
            state = create_train_state(cfg, jax.random.PRNGKey(0))
            step = make_sharded_train_step(cfg, mesh)
            b = shard_batch(batch, mesh)
            state, metrics = step(state, b)
            results.append(
                (
                    float(metrics["loss"]),
                    np.asarray(state.params["backbone"]["conv1_1"]["kernel"]),
                )
            )
        (l1, p1), (l8, p8) = results
        assert l1 == pytest.approx(l8, rel=1e-5)
        np.testing.assert_allclose(p1, p8, rtol=1e-5, atol=1e-7)
