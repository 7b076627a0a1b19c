"""Unit tests for dan_tpu.box: anchors, IoU, matching, encode/decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.box import (
    center_to_corner,
    corner_to_center,
    decode_boxes,
    encode_boxes,
    generate_anchors_np,
    match_anchors,
    pairwise_iou,
)
from dan_tpu.config import AnchorConfig, MatchConfig

from tests import oracles

ACFG = AnchorConfig()
MCFG = MatchConfig(max_gt=8)


class TestAnchors:
    def test_total_count_640(self):
        anchors = generate_anchors_np(ACFG, 640, 640)
        # 160^2 + 80^2 + 40^2 + 20^2 + 10^2 + 5^2
        assert anchors.shape == (25600 + 6400 + 1600 + 400 + 100 + 25, 4)

    def test_first_layer_grid(self):
        anchors = generate_anchors_np(ACFG, 640, 640)
        # First anchor: stride 4, center (2, 2), size 16.
        np.testing.assert_allclose(anchors[0], [2.0, 2.0, 16.0, 16.0])
        # Second anchor is one step in x (row-major).
        np.testing.assert_allclose(anchors[1], [6.0, 2.0, 16.0, 16.0])
        # Row stride: after 160 anchors, y advances by 4.
        np.testing.assert_allclose(anchors[160], [2.0, 6.0, 16.0, 16.0])

    def test_last_layer(self):
        anchors = generate_anchors_np(ACFG, 640, 640)
        # Last anchor: stride 128 grid is 5x5, center ((4+.5)*128) = 576.
        np.testing.assert_allclose(anchors[-1], [576.0, 576.0, 512.0, 512.0])

    def test_non_square(self):
        anchors = generate_anchors_np(ACFG, 480, 640)
        expected = sum(
            (-(-480 // s)) * (-(-640 // s)) for s in ACFG.strides
        )
        assert anchors.shape == (expected, 4)

    def test_corner_center_roundtrip(self):
        rng = np.random.default_rng(1)
        boxes = rng.uniform(0, 100, size=(50, 4)).astype(np.float32)
        boxes = np.concatenate(
            [boxes[:, :2], boxes[:, :2] + np.abs(boxes[:, 2:])], axis=-1
        )
        out = np.asarray(center_to_corner(corner_to_center(jnp.asarray(boxes))))
        np.testing.assert_allclose(out, boxes, rtol=1e-5, atol=1e-4)


class TestIoU:
    def test_vs_oracle_random(self, rng):
        a = rng.uniform(0, 100, size=(17, 4)).astype(np.float32)
        b = rng.uniform(0, 100, size=(9, 4)).astype(np.float32)
        a = np.concatenate([np.minimum(a[:, :2], a[:, 2:]), np.maximum(a[:, :2], a[:, 2:])], -1)
        b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], -1)
        got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
        want = oracles.iou_matrix(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_identical_boxes(self):
        box = jnp.array([[10.0, 10.0, 20.0, 20.0]])
        assert np.asarray(pairwise_iou(box, box))[0, 0] == pytest.approx(1.0)

    def test_disjoint(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.array([[20.0, 20.0, 30.0, 30.0]])
        assert np.asarray(pairwise_iou(a, b))[0, 0] == 0.0

    def test_degenerate_zero(self):
        a = jnp.array([[0.0, 0.0, 0.0, 0.0]])
        b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        assert np.asarray(pairwise_iou(a, b))[0, 0] == 0.0


class TestEncodeDecode:
    def test_roundtrip_identity(self, rng):
        anchors = jnp.asarray(generate_anchors_np(ACFG, 640, 640)[::1000])
        n = anchors.shape[0]
        gt_center = jnp.asarray(
            np.stack(
                [
                    rng.uniform(50, 590, n),
                    rng.uniform(50, 590, n),
                    rng.uniform(5, 300, n),
                    rng.uniform(5, 300, n),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        enc = encode_boxes(gt_center, anchors, ACFG.prior_scaling)
        dec = decode_boxes(enc, anchors, ACFG.prior_scaling)
        np.testing.assert_allclose(
            np.asarray(dec),
            np.asarray(center_to_corner(gt_center)),
            rtol=1e-4,
            atol=1e-2,
        )

    def test_encode_vs_oracle(self):
        anchor = jnp.array([[100.0, 100.0, 32.0, 32.0]])
        gt_center = jnp.array([[110.0, 95.0, 48.0, 24.0]])
        got = np.asarray(
            encode_boxes(gt_center, anchor, ACFG.prior_scaling)
        )[0]
        want = oracles.encode(gt_center[0], anchor[0])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_decode_clips(self):
        anchor = jnp.array([[5.0, 5.0, 100.0, 100.0]])
        dec = decode_boxes(
            jnp.zeros((1, 4)), anchor, ACFG.prior_scaling, image_h=640.0, image_w=640.0
        )
        assert np.asarray(dec)[0, 0] == 0.0 and np.asarray(dec)[0, 1] == 0.0


def _simple_anchors():
    """A tiny hand-built anchor set: 4 anchors on a line."""
    return jnp.array(
        [
            [8.0, 8.0, 16.0, 16.0],
            [24.0, 8.0, 16.0, 16.0],
            [40.0, 8.0, 16.0, 16.0],
            [56.0, 8.0, 16.0, 16.0],
        ]
    )


class TestMatching:
    def test_direct_match(self):
        anchors = _simple_anchors()
        # gt exactly on anchor 1.
        gt = jnp.array([[16.0, 0.0, 32.0, 16.0]] + [[0.0] * 4] * 7)
        mask = jnp.array([True] + [False] * 7)
        t = match_anchors(anchors, gt, mask, MCFG, ACFG)
        cls = np.asarray(t.cls_target)
        assert cls[1] == 1
        # Padded gts never create positives on unrelated anchors.
        assert cls[3] == 0

    def test_force_match_low_iou(self):
        anchors = _simple_anchors()
        # Tiny gt inside anchor 2's cell: IoU < 0.35 but must force-match.
        gt = jnp.array([[38.0, 6.0, 42.0, 10.0]] + [[0.0] * 4] * 7)
        mask = jnp.array([True] + [False] * 7)
        cfg = MatchConfig(max_gt=8, enable_scale_comp=False)
        t = match_anchors(anchors, gt, mask, cfg, ACFG)
        cls = np.asarray(t.cls_target)
        assert cls[2] == 1 and cls.sum() == 1
        assert np.asarray(t.matched_gt)[2] == 0

    def test_scale_comp_adds_matches(self):
        anchors = _simple_anchors()
        # Overlaps anchors 0 and 1 weakly (IoU ~0.14 each > 0.1).
        gt = jnp.array([[10.0, 0.0, 30.0, 8.0]] + [[0.0] * 4] * 7)
        mask = jnp.array([True] + [False] * 7)
        no_comp = match_anchors(
            anchors, gt, mask, MatchConfig(max_gt=8, enable_scale_comp=False), ACFG
        )
        with_comp = match_anchors(
            anchors, gt, mask, MatchConfig(max_gt=8, enable_scale_comp=True), ACFG
        )
        assert (np.asarray(with_comp.cls_target) == 1).sum() >= (
            np.asarray(no_comp.cls_target) == 1
        ).sum()
        # Scale comp must pick up anchors with IoU > 0.1.
        assert (np.asarray(with_comp.cls_target) == 1).sum() == 2

    def test_no_gt_all_background(self):
        anchors = _simple_anchors()
        gt = jnp.zeros((8, 4))
        mask = jnp.zeros((8,), dtype=bool)
        t = match_anchors(anchors, gt, mask, MCFG, ACFG)
        assert (np.asarray(t.cls_target) == 0).all()
        assert np.isfinite(np.asarray(t.loc_target)).all()

    def test_loc_targets_encode_matched_gt(self):
        anchors = _simple_anchors()
        gt = jnp.array([[14.0, 0.0, 34.0, 18.0]] + [[0.0] * 4] * 7)
        mask = jnp.array([True] + [False] * 7)
        t = match_anchors(anchors, gt, mask, MCFG, ACFG)
        cls = np.asarray(t.cls_target)
        pos = np.nonzero(cls == 1)[0]
        assert len(pos) >= 1
        a = np.asarray(anchors)[pos[0]]
        want = oracles.encode([24.0, 9.0, 20.0, 18.0], a)
        np.testing.assert_allclose(
            np.asarray(t.loc_target)[pos[0]], want, rtol=1e-4, atol=1e-4
        )

    def test_two_gt_compete(self):
        anchors = _simple_anchors()
        # Both gts overlap anchor 1; higher-IoU gt wins.
        gt = jnp.array(
            [[16.0, 0.0, 32.0, 16.0], [20.0, 0.0, 36.0, 16.0]] + [[0.0] * 4] * 6
        )
        mask = jnp.array([True, True] + [False] * 6)
        t = match_anchors(anchors, gt, mask, MCFG, ACFG)
        assert np.asarray(t.matched_gt)[1] == 0  # exact overlap wins

    def test_jit_fixed_shape(self):
        anchors = _simple_anchors()
        f = jax.jit(
            lambda g, m: match_anchors(anchors, g, m, MCFG, ACFG)
        )
        gt = jnp.zeros((8, 4))
        mask = jnp.zeros((8,), dtype=bool)
        out = f(gt, mask)
        assert out.cls_target.shape == (4,)
        assert out.loc_target.shape == (4, 4)
