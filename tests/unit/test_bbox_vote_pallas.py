"""Pallas bbox-vote kernel parity vs the XLA version (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dan_tpu.ops.bbox_vote import bbox_vote
from dan_tpu.ops.bbox_vote_pallas import bbox_vote_pallas


def _random_dets(rng, n):
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(2, 40, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


class TestVotePallasParity:
    @pytest.mark.parametrize("seed,n,thresh", [(0, 40, 0.3), (1, 150, 0.4)])
    def test_vs_xla(self, seed, n, thresh):
        rng = np.random.default_rng(seed)
        boxes, scores = _random_dets(rng, n)
        valid = rng.uniform(size=n) > 0.2
        want = bbox_vote(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh, 20
        )
        got = bbox_vote_pallas(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(valid),
            thresh,
            20,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
        np.testing.assert_allclose(
            np.asarray(got.boxes), np.asarray(want.boxes), rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6
        )

    def test_empty(self):
        got = bbox_vote_pallas(
            jnp.zeros((8, 4)),
            jnp.zeros((8,)),
            jnp.zeros((8,), bool),
            0.3,
            5,
            interpret=True,
        )
        assert not np.asarray(got.valid).any()


class TestVoteBatchedParity:
    """Batched lockstep kernel == per-image XLA vote, row by row."""

    @pytest.mark.parametrize("seed,b,n,thresh", [(0, 5, 96, 0.3), (2, 9, 200, 0.4)])
    def test_vs_per_image_xla(self, seed, b, n, thresh):
        from dan_tpu.ops.bbox_vote_pallas import bbox_vote_pallas_batched

        rng = np.random.default_rng(seed)
        boxes = np.stack([_random_dets(rng, n)[0] for _ in range(b)])
        scores = rng.uniform(0.01, 1.0, (b, n)).astype(np.float32)
        valid = rng.uniform(size=(b, n)) > 0.3
        valid[1] = False  # a fully-empty row mid-batch
        valid[2, 5:] = False  # a row that exhausts long before max_out
        got = bbox_vote_pallas_batched(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(valid),
            thresh,
            20,
            interpret=True,
        )
        for i in range(b):
            want = bbox_vote(
                jnp.asarray(boxes[i]),
                jnp.asarray(scores[i]),
                jnp.asarray(valid[i]),
                thresh,
                20,
            )
            np.testing.assert_array_equal(
                np.asarray(got.valid[i]), np.asarray(want.valid)
            )
            np.testing.assert_allclose(
                np.asarray(got.boxes[i]), np.asarray(want.boxes),
                rtol=1e-5, atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(got.scores[i]), np.asarray(want.scores), rtol=1e-6
            )
        # And the batched XLA twin matches bitwise against itself per row.
        from dan_tpu.ops.bbox_vote import bbox_vote_batched

        xla = bbox_vote_batched(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            thresh, 20,
        )
        np.testing.assert_array_equal(
            np.asarray(xla.valid), np.asarray(got.valid)
        )
        np.testing.assert_allclose(
            np.asarray(xla.boxes), np.asarray(got.boxes), rtol=1e-5, atol=1e-4
        )
