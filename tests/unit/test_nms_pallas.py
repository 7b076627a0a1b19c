"""Pallas NMS kernel parity vs the XLA while_loop version and the numpy
oracle (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dan_tpu.ops.nms import greedy_nms, topk_select
from dan_tpu.ops.nms_batched_pallas import greedy_nms_pallas_batched
from dan_tpu.ops.nms_blocked_pallas import greedy_nms_blocked
from dan_tpu.ops.nms_pallas import greedy_nms_pallas

from tests import oracles


def _random_boxes(rng, n):
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(2, 40, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


class TestNMSPallasParity:
    @pytest.mark.parametrize("seed,n,thresh", [(0, 50, 0.3), (1, 130, 0.5), (2, 257, 0.4)])
    def test_vs_xla(self, seed, n, thresh):
        rng = np.random.default_rng(seed)
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        want = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, 20)
        got = greedy_nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), thresh, 20, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )
        np.testing.assert_allclose(
            np.asarray(got.boxes), np.asarray(want.boxes), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6
        )

    def test_vs_numpy_oracle(self):
        rng = np.random.default_rng(3)
        boxes = _random_boxes(rng, 40)
        scores = rng.uniform(0.01, 1.0, 40).astype(np.float32)
        want_idx = oracles.greedy_nms(boxes, scores, 0.3, max_out=10)
        got = greedy_nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, 10, interpret=True
        )
        got_idx = np.asarray(got.indices)[np.asarray(got.valid)]
        np.testing.assert_array_equal(got_idx, want_idx[: len(got_idx)])

    def test_empty(self):
        got = greedy_nms_pallas(
            jnp.zeros((10, 4)), jnp.zeros((10,)), 0.3, 5, interpret=True
        )
        assert not np.asarray(got.valid).any()

    def test_score_threshold(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.01])
        got = greedy_nms_pallas(
            boxes, scores, 0.3, 5, score_threshold=0.05, interpret=True
        )
        assert np.asarray(got.valid).sum() == 1


class TestBlockedNMSParity:
    """The blocked kernel requires score-sorted input (topk_select)."""

    @pytest.mark.parametrize(
        "seed,n,thresh", [(0, 50, 0.3), (1, 130, 0.5), (2, 300, 0.4), (5, 1000, 0.3)]
    )
    def test_vs_xla(self, seed, n, thresh):
        rng = np.random.default_rng(seed)
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        bs, ss = topk_select(jnp.asarray(boxes), jnp.asarray(scores), n)
        want = greedy_nms(bs, ss, thresh, 40)
        got = greedy_nms_blocked(bs, ss, thresh, 40, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )
        np.testing.assert_allclose(
            np.asarray(got.boxes), np.asarray(want.boxes), rtol=1e-6
        )

    def test_empty(self):
        got = greedy_nms_blocked(
            jnp.zeros((10, 4)), jnp.zeros((10,)), 0.3, 5,
            score_threshold=0.0, interpret=True,
        )
        assert not np.asarray(got.valid).any()

    @pytest.mark.parametrize("kernel", [greedy_nms_pallas, greedy_nms_blocked])
    def test_max_out_exceeds_input(self, kernel):
        """Drop-in contract: max_out > N must zero-pad like the XLA twin,
        not crash in top_k."""
        rng = np.random.default_rng(9)
        boxes = _random_boxes(rng, 20)
        scores = np.sort(rng.uniform(0.1, 1.0, 20).astype(np.float32))[::-1].copy()
        got = kernel(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, 750, interpret=True
        )
        want = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3, 750)
        assert got.boxes.shape == (750, 4)
        np.testing.assert_array_equal(
            np.asarray(got.valid), np.asarray(want.valid)
        )
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )


class TestBatchedNMSParity:
    def test_vs_per_image(self):
        rng = np.random.default_rng(11)
        B, N = 5, 150
        boxes = np.zeros((B, N, 4), np.float32)
        scores = np.zeros((B, N), np.float32)
        for b in range(B):
            boxes[b] = _random_boxes(rng, N)
            scores[b] = rng.uniform(0.01, 1.0, N)
        got = greedy_nms_pallas_batched(
            jnp.asarray(boxes), jnp.asarray(scores), 0.4, 25, interpret=True
        )
        for b in range(B):
            want = greedy_nms(jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.4, 25)
            np.testing.assert_array_equal(
                np.asarray(got.indices[b]), np.asarray(want.indices)
            )
            np.testing.assert_array_equal(
                np.asarray(got.valid[b]), np.asarray(want.valid)
            )

    def test_max_out_exceeds_n(self):
        rng = np.random.default_rng(12)
        boxes = np.stack([_random_boxes(rng, 20) for _ in range(3)])
        scores = rng.uniform(0.1, 1.0, (3, 20)).astype(np.float32)
        got = greedy_nms_pallas_batched(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, 100, interpret=True
        )
        assert got.boxes.shape == (3, 100, 4)


class TestBatchedNMSGrid:
    def test_multi_slab_grid_matches_per_image(self):
        """B larger than the VMEM batch chunk (64) exercises the grid path
        (batch 128 previously over-allocated scoped VMEM and failed to
        compile); every row must still match the per-image oracle."""
        rng = np.random.default_rng(13)
        B, N = 80, 96
        boxes = np.zeros((B, N, 4), np.float32)
        scores = np.zeros((B, N), np.float32)
        for b in range(B):
            boxes[b] = _random_boxes(rng, N)
            scores[b] = rng.uniform(0.01, 1.0, N)
        got = greedy_nms_pallas_batched(
            jnp.asarray(boxes), jnp.asarray(scores), 0.4, 10, interpret=True
        )
        for b in [0, 31, 63, 64, 79]:  # straddle the slab boundary
            want = greedy_nms(
                jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.4, 10
            )
            np.testing.assert_array_equal(
                np.asarray(got.indices[b]), np.asarray(want.indices)
            )
            np.testing.assert_array_equal(
                np.asarray(got.valid[b]), np.asarray(want.valid)
            )

    def test_infeasible_n_raises_instead_of_vmem_oom(self):
        """N large enough that even an 8-row slab exceeds scoped VMEM must
        fail loudly with guidance, not die in the Mosaic VMEM checker."""
        import pytest

        boxes = jnp.zeros((8, 60000, 4), jnp.float32)
        scores = jnp.zeros((8, 60000), jnp.float32)
        with pytest.raises(ValueError, match="XLA NMS"):
            greedy_nms_pallas_batched(boxes, scores, 0.4, 10, interpret=True)
