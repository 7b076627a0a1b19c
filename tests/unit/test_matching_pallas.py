"""Pallas matching kernel parity vs the XLA reference implementation
(interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dan_tpu.box.anchors import generate_anchors_np
from dan_tpu.box.matching import match_anchors
from dan_tpu.config import AnchorConfig, MatchConfig
from dan_tpu.ops.matching_pallas import match_anchors_pallas

ACFG = AnchorConfig()


def _random_case(seed, n_gt, img=128, max_gt=16):
    rng = np.random.default_rng(seed)
    gt = np.zeros((max_gt, 4), np.float32)
    mask = np.zeros((max_gt,), bool)
    xy = rng.uniform(0, img - 20, (n_gt, 2))
    wh = rng.uniform(4, img / 2, (n_gt, 2))
    gt[:n_gt] = np.concatenate([xy, np.minimum(xy + wh, img)], -1)
    mask[:n_gt] = True
    return jnp.asarray(gt), jnp.asarray(mask)


@pytest.mark.parametrize("seed,n_gt,comp", [(0, 3, True), (1, 9, True), (2, 0, True), (3, 5, False), (4, 16, True)])
def test_parity_vs_xla(seed, n_gt, comp):
    anchors = jnp.asarray(generate_anchors_np(ACFG, 128, 128))
    cfg = MatchConfig(max_gt=16, enable_scale_comp=comp)
    gt, mask = _random_case(seed, n_gt)
    want = match_anchors(anchors, gt, mask, cfg, ACFG)
    got = match_anchors_pallas(anchors, gt, mask, cfg, ACFG, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got.cls_target), np.asarray(want.cls_target)
    )
    # matched_gt only meaningful on positives.
    pos = np.asarray(want.cls_target) == 1
    np.testing.assert_array_equal(
        np.asarray(got.matched_gt)[pos], np.asarray(want.matched_gt)[pos]
    )
    np.testing.assert_allclose(
        np.asarray(got.matched_iou), np.asarray(want.matched_iou), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.loc_target)[pos],
        np.asarray(want.loc_target)[pos],
        rtol=1e-5,
        atol=1e-5,
    )


def test_every_valid_gt_matched():
    anchors = jnp.asarray(generate_anchors_np(ACFG, 128, 128))
    cfg = MatchConfig(max_gt=16)
    gt, mask = _random_case(7, 10)
    got = match_anchors_pallas(anchors, gt, mask, cfg, ACFG, interpret=True)
    matched = set(np.asarray(got.matched_gt)[np.asarray(got.cls_target) == 1])
    assert set(range(10)) <= matched
