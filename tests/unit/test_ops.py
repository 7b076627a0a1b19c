"""Tests for on-device NMS, bbox-vote, and preprocessing ops."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.config import PostprocessConfig, PreprocessConfig
from dan_tpu.ops import (
    CropParams,
    bbox_vote,
    color_distort,
    crop_and_resize,
    greedy_nms,
    hflip,
    hsv_to_rgb,
    rgb_to_hsv,
    topk_select,
    transform_boxes,
)

from tests import oracles


def _random_boxes(rng, n, lo=0, hi=100, min_size=2, max_size=40):
    xy = rng.uniform(lo, hi, (n, 2))
    wh = rng.uniform(min_size, max_size, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


class TestNMS:
    @pytest.mark.parametrize("seed,n,thresh", [(0, 40, 0.3), (1, 100, 0.5), (2, 7, 0.45)])
    def test_vs_oracle(self, seed, n, thresh):
        rng = np.random.default_rng(seed)
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        want_idx = oracles.greedy_nms(boxes, scores, thresh, max_out=20)
        res = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, 20)
        got_idx = np.asarray(res.indices)[np.asarray(res.valid)]
        np.testing.assert_array_equal(got_idx, want_idx[: len(got_idx)])
        assert len(got_idx) == min(len(want_idx), 20)
        # Kept boxes/scores match inputs at kept indices.
        np.testing.assert_allclose(
            np.asarray(res.boxes)[: len(got_idx)], boxes[got_idx]
        )

    def test_empty_input(self):
        res = greedy_nms(jnp.zeros((10, 4)), jnp.zeros((10,)), 0.3, 5)
        assert not np.asarray(res.valid).any()
        assert (np.asarray(res.indices) == -1).all()

    def test_single_box(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        res = greedy_nms(boxes, jnp.array([0.9]), 0.3, 5)
        v = np.asarray(res.valid)
        assert v[0] and not v[1:].any()

    def test_identical_boxes_suppressed(self):
        boxes = jnp.tile(jnp.array([[0.0, 0.0, 10.0, 10.0]]), (5, 1))
        scores = jnp.array([0.5, 0.9, 0.7, 0.3, 0.1])
        res = greedy_nms(boxes, scores, 0.5, 5)
        assert np.asarray(res.valid).sum() == 1
        assert np.asarray(res.indices)[0] == 1  # highest score wins

    def test_score_threshold(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
        scores = jnp.array([0.9, 0.01])
        res = greedy_nms(boxes, scores, 0.3, 5, score_threshold=0.05)
        assert np.asarray(res.valid).sum() == 1

    def test_jit(self):
        f = jax.jit(lambda b, s: greedy_nms(b, s, 0.3, 10))
        rng = np.random.default_rng(3)
        boxes = _random_boxes(rng, 50)
        res = f(jnp.asarray(boxes), jnp.ones((50,)) * 0.5)
        assert res.boxes.shape == (10, 4)

    def test_topk_select(self):
        rng = np.random.default_rng(4)
        boxes = _random_boxes(rng, 30)
        scores = rng.uniform(0, 1, 30).astype(np.float32)
        b, s = topk_select(jnp.asarray(boxes), jnp.asarray(scores), 5)
        order = np.argsort(-scores)[:5]
        np.testing.assert_allclose(np.asarray(s), scores[order])
        np.testing.assert_allclose(np.asarray(b), boxes[order])


class TestBBoxVote:
    @pytest.mark.parametrize("seed,n", [(0, 30), (1, 80)])
    def test_vs_oracle(self, seed, n):
        rng = np.random.default_rng(seed)
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        dets = np.concatenate([boxes, scores[:, None]], axis=-1)
        want = oracles.bbox_vote(dets, iou_threshold=0.3, max_out=20)
        res = bbox_vote(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.3, 20
        )
        got_n = int(np.asarray(res.valid).sum())
        assert got_n == len(want)
        np.testing.assert_allclose(
            np.asarray(res.boxes)[:got_n], want[:, :4], rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.scores)[:got_n], want[:, 4], rtol=1e-5, atol=1e-6
        )

    def test_two_overlapping_merge(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0]])
        scores = jnp.array([0.9, 0.1])
        res = bbox_vote(boxes, scores, jnp.ones(2, bool), 0.3, 5)
        assert np.asarray(res.valid).sum() == 1
        want = (np.array([0, 0, 10, 10]) * 0.9 + np.array([1, 1, 11, 11]) * 0.1) / 1.0
        np.testing.assert_allclose(np.asarray(res.boxes)[0], want, rtol=1e-5)
        assert np.asarray(res.scores)[0] == pytest.approx(0.9)

    def test_respects_input_validity(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
        scores = jnp.array([0.9, 0.8])
        res = bbox_vote(boxes, scores, jnp.array([True, False]), 0.3, 5)
        assert np.asarray(res.valid).sum() == 1


class TestPreprocessGeometry:
    def test_identity_crop(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        crop = CropParams(jnp.float32(0), jnp.float32(0), jnp.float32(32))
        out = crop_and_resize(jnp.asarray(img), crop, 32)
        np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)

    def test_crop_quadrant(self):
        # Constant-valued quadrants: cropping one quadrant -> constant image.
        img = np.zeros((32, 32, 3), np.float32)
        img[:16, :16] = 0.25
        img[:16, 16:] = 0.5
        img[16:, :16] = 0.75
        img[16:, 16:] = 1.0
        crop = CropParams(jnp.float32(16), jnp.float32(0), jnp.float32(16))
        out = np.asarray(crop_and_resize(jnp.asarray(img), crop, 8))
        np.testing.assert_allclose(out, 0.5, rtol=1e-5)

    def test_crop_matches_pad_extract_resize_oracle(self):
        """Reference semantics end-to-end: pad the source with zeros,
        extract the (integer) window, half-pixel bilinear resize. The
        fused crop_and_resize must match for interior windows, windows on
        the canvas edge, and windows extending past the canvas (zero-fade
        at the border, clamp at the WINDOW edge — not the canvas edge)."""
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (40, 40, 3)).astype(np.float32)
        for x0, y0, size in [
            (-12, -7, 48),
            (5, 9, 20),
            (0, 0, 40),
            (-30, -30, 100),
            (25, 25, 30),
        ]:
            crop = CropParams(
                jnp.float32(x0), jnp.float32(y0), jnp.float32(size)
            )
            got = np.asarray(crop_and_resize(jnp.asarray(img), crop, 16))
            p = 128
            pad = np.zeros((40 + 2 * p, 40 + 2 * p, 3), np.float32)
            pad[p : p + 40, p : p + 40] = img
            win = pad[p + y0 : p + y0 + size, p + x0 : p + x0 + size]
            want = np.asarray(
                jax.image.resize(
                    jnp.asarray(win), (16, 16, 3), "bilinear", antialias=False
                )
            )
            np.testing.assert_allclose(
                got, want, rtol=1e-4, atol=1e-3,
                err_msg=f"window ({x0},{y0},{size})",
            )

    def test_upscale_matches_tf_halfpixel(self):
        # 2x upsample of a 2x2 ramp with half-pixel bilinear has known values.
        img = jnp.asarray(
            np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)[..., None]
        )
        crop = CropParams(jnp.float32(0), jnp.float32(0), jnp.float32(2))
        out = np.asarray(crop_and_resize(img, crop, 4))[..., 0]
        want = np.asarray(
            jax.image.resize(img, (4, 4, 1), "bilinear")
        )[..., 0]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_transform_boxes_inside_outside(self):
        boxes = jnp.array(
            [
                [10.0, 10.0, 20.0, 20.0],  # inside crop
                [50.0, 50.0, 60.0, 60.0],  # outside
                [0.0, 0.0, 0.0, 0.0],  # padding
            ]
        )
        mask = jnp.array([True, True, False])
        crop = CropParams(jnp.float32(8), jnp.float32(8), jnp.float32(24))
        nb, nm = transform_boxes(boxes, mask, crop, 48, min_size=1.0)
        nm = np.asarray(nm)
        assert nm.tolist() == [True, False, False]
        # (10-8)*2 = 4 .. (20-8)*2 = 24
        np.testing.assert_allclose(np.asarray(nb)[0], [4.0, 4.0, 24.0, 24.0])

    def test_hflip_roundtrip(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        boxes = jnp.array([[2.0, 3.0, 6.0, 9.0]])
        mask = jnp.array([True])
        img2, boxes2 = hflip(img, boxes, mask, 16.0)
        img3, boxes3 = hflip(img2, boxes2, mask, 16.0)
        np.testing.assert_allclose(np.asarray(img3), np.asarray(img))
        np.testing.assert_allclose(np.asarray(boxes3), np.asarray(boxes))
        np.testing.assert_allclose(np.asarray(boxes2)[0], [10.0, 3.0, 14.0, 9.0])


class TestColor:
    def test_hsv_roundtrip(self, rng):
        x = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(x))))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)

    def test_hsv_matches_colorsys(self):
        import colorsys

        vals = [(0.2, 0.4, 0.6), (0.9, 0.1, 0.1), (0.5, 0.5, 0.5), (0.0, 1.0, 0.3)]
        for rgb in vals:
            want = colorsys.rgb_to_hsv(*rgb)
            got = np.asarray(rgb_to_hsv(jnp.asarray([[list(rgb)]])))[0, 0]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_distort_in_range_and_deterministic(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        cfg = PreprocessConfig(color_distort_prob=1.0)
        key = jax.random.PRNGKey(7)
        a = np.asarray(color_distort(x, key, cfg))
        b = np.asarray(color_distort(x, key, cfg))
        np.testing.assert_array_equal(a, b)
        assert (a >= -1e-6).all() and (a <= 1.0 + 1e-6).all()
        assert not np.allclose(a, np.asarray(x))  # actually changed something

    def test_distort_prob_zero_identity(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        cfg = PreprocessConfig(color_distort_prob=0.0)
        out = np.asarray(color_distort(x, jax.random.PRNGKey(0), cfg))
        np.testing.assert_array_equal(out, np.asarray(x))

    def test_reference_order_in_range_and_deterministic(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        cfg = PreprocessConfig(
            color_distort_prob=1.0, color_distort_order="reference"
        )
        f = jax.jit(lambda im, k: color_distort(im, k, cfg))
        a = np.asarray(f(x, jax.random.PRNGKey(7)))
        b = np.asarray(f(x, jax.random.PRNGKey(7)))
        np.testing.assert_array_equal(a, b)
        assert (a >= -1e-6).all() and (a <= 1.0 + 1e-6).all()
        assert not np.allclose(a, np.asarray(x))

    def test_reference_order_samples_multiple_orderings(self, rng):
        # Different keys must land in different lax.switch branches; with a
        # hue-only distortion the orderings are distinguishable from 'fixed'
        # only statistically, so just check vmap works and outputs differ
        # across keys (i.e. the op ordering machinery runs per image).
        x = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32))
        cfg = PreprocessConfig(
            color_distort_prob=1.0, color_distort_order="reference"
        )
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        out = np.asarray(
            jax.jit(jax.vmap(lambda im, k: color_distort(im, k, cfg)))(x, keys)
        )
        assert out.shape == x.shape
        assert not np.allclose(out[0], out[1])

    def test_reference_order_prob_zero_identity(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        cfg = PreprocessConfig(
            color_distort_prob=0.0, color_distort_order="reference"
        )
        out = np.asarray(color_distort(x, jax.random.PRNGKey(0), cfg))
        np.testing.assert_array_equal(out, np.asarray(x))
