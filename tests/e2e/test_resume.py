"""Failure recovery (SURVEY.md §5): checkpoint mid-run, 'crash', restore
from latest, continue — resumed run must be bit-identical to an
uninterrupted one (momentum state included).  Plus compile-stability."""
import numpy as np
import pytest

import jax

from dan_tpu.ckpt.orbax_io import (
    TrainStateSaver,
    latest_step,
    restore_train_state,
    save_train_state,
)
from dan_tpu.data.synthetic import synthetic_batch
from dan_tpu.parallel.mesh import make_mesh, place_replicated, shard_batch
from dan_tpu.train import create_train_state, make_sharded_train_step

from tests.e2e.test_train_step import tiny_config


class TestResume:
    def test_kill_and_resume_bit_identical(self, tmp_path):
        cfg = tiny_config()
        mesh = make_mesh()
        step_fn = make_sharded_train_step(cfg, mesh)
        batches = [synthetic_batch(cfg, 8, seed=i) for i in range(4)]

        # Uninterrupted run.
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        for b in batches:
            state, _ = step_fn(state, shard_batch(b, mesh))
        want = np.asarray(state.params["backbone"]["conv1_1"]["kernel"])
        want_step = int(state.step)

        # Interrupted run: 2 steps, save, 'crash' (drop everything),
        # restore latest, finish.
        state2 = create_train_state(cfg, jax.random.PRNGKey(0))
        for b in batches[:2]:
            state2, _ = step_fn(state2, shard_batch(b, mesh))
        save_train_state(str(tmp_path), int(state2.step), state2)
        del state2

        assert latest_step(str(tmp_path)) == 2
        abstract = jax.tree_util.tree_map(
            np.asarray, create_train_state(cfg, jax.random.PRNGKey(0))
        )
        restored = restore_train_state(str(tmp_path), abstract)
        assert int(restored.step) == 2
        state3 = jax.tree_util.tree_map(jax.numpy.asarray, restored)
        for b in batches[2:]:
            state3, _ = step_fn(state3, shard_batch(b, mesh))

        assert int(state3.step) == want_step
        got = np.asarray(state3.params["backbone"]["conv1_1"]["kernel"])
        np.testing.assert_array_equal(got, want)

    def test_async_saver_overlaps_training(self, tmp_path):
        """TrainStateSaver: the write completes in the background while the
        step loop keeps mutating state; the checkpoint must capture the
        state AT save() time, bit-exactly, and restore cleanly."""
        cfg = tiny_config()
        mesh = make_mesh()
        step_fn = make_sharded_train_step(cfg, mesh)
        state = place_replicated(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
        with TrainStateSaver() as saver:
            state, _ = step_fn(state, shard_batch(synthetic_batch(cfg, 8, seed=0), mesh))
            want = np.asarray(state.params["backbone"]["conv1_1"]["kernel"])
            saver.save(str(tmp_path), int(state.step), state)
            # Keep training (donated-state step mutates buffers) while the
            # background write is in flight.
            for i in range(1, 4):
                state, _ = step_fn(
                    state, shard_batch(synthetic_batch(cfg, 8, seed=i), mesh)
                )
            saver.wait()
        assert latest_step(str(tmp_path)) == 1
        abstract = jax.tree_util.tree_map(
            np.asarray, create_train_state(cfg, jax.random.PRNGKey(0))
        )
        restored = restore_train_state(str(tmp_path), abstract)
        assert int(restored.step) == 1
        np.testing.assert_array_equal(
            np.asarray(restored.params["backbone"]["conv1_1"]["kernel"]), want
        )

    def test_no_recompilation_across_steps(self):
        """The train step must compile exactly once for fixed shapes
        (SURVEY.md §4 item 3)."""
        cfg = tiny_config()
        mesh = make_mesh()
        step_fn = make_sharded_train_step(cfg, mesh)
        state = place_replicated(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
        for i in range(3):
            state, _ = step_fn(state, shard_batch(synthetic_batch(cfg, 8, seed=i), mesh))
        assert step_fn._cache_size() == 1

    def test_saver_retention_prunes_old_checkpoints(self, tmp_path):
        """max_to_keep bounds disk use (the reference tf.train.Saver keeps
        5): older finalized step dirs are pruned, the newest survive, and
        latest_step/restore still work."""
        cfg = tiny_config()
        mesh = make_mesh()
        state = place_replicated(
            create_train_state(cfg, jax.random.PRNGKey(0)), mesh
        )
        with TrainStateSaver(max_to_keep=3) as saver:
            for s in range(1, 8):
                saver.save(str(tmp_path), s, state._replace(step=s))
                saver.wait()  # finalize so pruning sees each dir
        import os
        import re

        kept = sorted(
            int(m.group(1))
            for d in os.listdir(str(tmp_path))
            if (m := re.fullmatch(r"step_(\d+)", d))
        )
        assert kept == [5, 6, 7], kept
        assert latest_step(str(tmp_path)) == 7
        abstract = jax.tree_util.tree_map(
            np.asarray, create_train_state(cfg, jax.random.PRNGKey(0))
        )
        restored = restore_train_state(str(tmp_path), abstract)
        assert int(restored.step) == 7

    def test_prune_sweeps_orphaned_pruning_dirs(self, tmp_path):
        """A crash between rename and rmtree leaves 'step_N.pruning';
        the next prune pass must sweep it."""
        import os

        cfg = tiny_config()
        mesh = make_mesh()
        state = place_replicated(
            create_train_state(cfg, jax.random.PRNGKey(0)), mesh
        )
        orphan = tmp_path / "step_00000001.pruning"
        orphan.mkdir()
        (orphan / "junk").write_text("x")
        with TrainStateSaver(max_to_keep=3) as saver:
            saver.save(str(tmp_path), 2, state._replace(step=2))
            saver.wait()
        assert not orphan.exists()
        assert latest_step(str(tmp_path)) == 2
