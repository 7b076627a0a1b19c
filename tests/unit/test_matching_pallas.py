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


def test_batch_dispatch_small_and_full_variants():
    """match_anchors_batch's per-image G-128 dispatch: an image whose gts
    all fit in the first 128 slots takes the half-width kernel, one with a
    valid gt beyond slot 128 takes the full kernel — both must equal the
    XLA reference exactly."""
    from dan_tpu.box.matching import match_anchors_batch

    max_gt = 160
    anchors = jnp.asarray(generate_anchors_np(ACFG, 128, 128))
    cfg = MatchConfig(max_gt=max_gt)
    rng = np.random.default_rng(11)
    gt = np.zeros((2, max_gt, 4), np.float32)
    mask = np.zeros((2, max_gt), bool)
    for b, slots in enumerate([range(5), list(range(3)) + [150, 155]]):
        for s in slots:
            xy = rng.uniform(0, 100, 2)
            wh = rng.uniform(6, 60, 2)
            gt[b, s] = [*xy, *np.minimum(xy + wh, 128)]
            mask[b, s] = True
    gt, mask = jnp.asarray(gt), jnp.asarray(mask)

    got = match_anchors_batch(
        anchors, gt, mask, cfg, ACFG, use_pallas=True, interpret=True
    )
    want = jax.vmap(lambda b, m: match_anchors(anchors, b, m, cfg, ACFG))(
        gt, mask
    )
    np.testing.assert_array_equal(
        np.asarray(got.cls_target), np.asarray(want.cls_target)
    )
    pos = np.asarray(want.cls_target) == 1
    np.testing.assert_array_equal(
        np.asarray(got.matched_gt)[pos], np.asarray(want.matched_gt)[pos]
    )
    np.testing.assert_allclose(
        np.asarray(got.loc_target)[pos],
        np.asarray(want.loc_target)[pos],
        rtol=1e-5,
        atol=1e-5,
    )


def test_batch_dispatch_all_invalid_image():
    """An image with zero valid gts must produce all-background targets
    through the small-variant dispatch (not NaNs or spurious positives)."""
    from dan_tpu.box.matching import match_anchors_batch

    max_gt = 160
    anchors = jnp.asarray(generate_anchors_np(ACFG, 128, 128))
    cfg = MatchConfig(max_gt=max_gt)
    gt = jnp.zeros((1, max_gt, 4), jnp.float32)
    mask = jnp.zeros((1, max_gt), bool)
    got = match_anchors_batch(
        anchors, gt, mask, cfg, ACFG, use_pallas=True, interpret=True
    )
    assert (np.asarray(got.cls_target) == 0).all()
    assert np.isfinite(np.asarray(got.loc_target)).all()
    assert np.isfinite(np.asarray(got.matched_iou)).all()


def test_parity_heavy_ties_grid_aligned_gts():
    """Grid-aligned identical gt boxes create exact IoU ties across both
    anchors and gts — the stress case for the kernels' lexicographic
    tie-breaks (value desc, index asc) vs the XLA reference."""
    anchors = jnp.asarray(generate_anchors_np(ACFG, 128, 128))
    cfg = MatchConfig(max_gt=16)
    gt = np.zeros((16, 4), np.float32)
    mask = np.zeros((16,), bool)
    # Three identical boxes + two grid-aligned shifted copies.
    gt[0] = gt[1] = gt[2] = [32, 32, 64, 64]
    gt[3] = [64, 32, 96, 64]
    gt[4] = [32, 64, 64, 96]
    mask[:5] = True
    gt, mask = jnp.asarray(gt), jnp.asarray(mask)
    want = match_anchors(anchors, gt, mask, cfg, ACFG)
    got = match_anchors_pallas(anchors, gt, mask, cfg, ACFG, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got.cls_target), np.asarray(want.cls_target)
    )
    pos = np.asarray(want.cls_target) == 1
    np.testing.assert_array_equal(
        np.asarray(got.matched_gt)[pos], np.asarray(want.matched_gt)[pos]
    )


def test_pallas_matcher_under_shard_map_island():
    """The train step wraps the matcher in a shard_map island on multi-
    device meshes; the Pallas path must trace under it (check_vma=False —
    Pallas custom calls carry no varying-mesh-axes info and default VMA
    checking rejects them).  Mirrors train/loop.py::preprocess_and_match
    with the kernels in interpret mode on the CPU mesh."""
    from jax.sharding import PartitionSpec as P

    from dan_tpu.box.matching import match_anchors_batch
    from dan_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(n_devices=len(jax.devices()))
    cfg = MatchConfig(max_gt=160)
    anchors = jnp.asarray(generate_anchors_np(ACFG, 128, 128))
    n = len(jax.devices())
    gt = jnp.zeros((n, 160, 4), jnp.float32)
    mask = jnp.zeros((n, 160), bool)

    def fn(b, m):
        return match_anchors_batch(
            anchors, b, m, cfg, ACFG, use_pallas=True, interpret=True
        )

    out = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )(gt, mask)
    assert np.asarray(out.cls_target).shape[0] == n
