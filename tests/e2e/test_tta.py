"""TTA runner e2e smoke: full pyramid+flip+vote path on a tiny config."""
import numpy as np
import pytest

import jax

from dan_tpu.config import (
    DANConfig,
    MatchConfig,
    ModelConfig,
    PostprocessConfig,
    PreprocessConfig,
    TTAConfig,
)


from dan_tpu.eval.tta import TTARunner
from dan_tpu.models.detector import init_detector_params


def test_bucket_chunk_hbm_budget():
    """Large buckets take smaller launches: per-device activation pixels
    (bucket^2 x local batch) stay under the HBM budget — 2048^2 x 16
    compile-OOMs a 16 GB v5e (r4 dataset-scale sweep), so the 2048 bucket
    must cap at 8/device while small buckets keep the requested batch."""
    from dan_tpu.config import DANConfig
    from dan_tpu.eval.tta import TTARunner

    r = TTARunner(params={}, config=DANConfig())
    assert r.bucket_chunk(2048, 1, 16) == 8
    assert r.bucket_chunk(2048, 8, 16) == 64  # 8/device x 8 devices
    assert r.bucket_chunk(1280, 1, 16) == 16  # under budget: unchanged
    assert r.bucket_chunk(640, 1, 32) == 32
    assert r.bucket_chunk(2048, 1, 1) == 1  # never raises the request
    r_small = TTARunner(params={}, config=DANConfig(), pixel_budget=640 * 640)
    assert r_small.bucket_chunk(640, 1, 8) == 1


def tiny_config():
    return DANConfig(
        model=ModelConfig(image_size=64, compute_dtype="float32"),
        preprocess=PreprocessConfig(train_image_size=64, canvas_size=128),
        match=MatchConfig(max_gt=8),
        postprocess=PostprocessConfig(pre_nms_topk=64, max_detections=8),
        tta=TTAConfig(
            buckets=(64, 128),
            scales=(0.5, 1.5),
            extra_scale_small_images=0.0,
            max_pixels=1e9,  # shrink = 1 for the test image
        ),
    )


@pytest.fixture(scope="module")
def runner():
    cfg = tiny_config()
    params = init_detector_params(jax.random.PRNGKey(0), cfg.model)
    return TTARunner(params, cfg)


class TestTTA:
    def test_detect_tta_contract(self, runner, rng):
        img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
        out = runner.detect_tta(img)
        assert set(out) == {"bboxes", "scores"}
        assert out["bboxes"].shape[0] == out["scores"].shape[0]
        assert out["bboxes"].shape[0] <= 8
        if len(out["bboxes"]):
            # Vote-fused boxes stay within the original image frame
            # (decode clips per-variant before unscaling).
            assert out["bboxes"][:, [0, 2]].max() <= 100 + 2
            assert out["bboxes"][:, [1, 3]].max() <= 80 + 2

    def test_deterministic(self, runner, rng):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        a = runner.detect_tta(img)
        b = runner.detect_tta(img)
        np.testing.assert_array_equal(a["bboxes"], b["bboxes"])

    @pytest.mark.parametrize("h,w", [(1, 1), (2, 100), (100, 2), (1, 200)])
    def test_degenerate_image_geometry(self, runner, rng, h, w):
        """Extreme aspect ratios and 1-pixel images must plan, run, and
        return an in-frame detection dict (no NaNs, no crashes) — the
        planner's cap/shrink rules and the on-device resample both see
        sizes far outside the WIDER distribution here."""
        from dan_tpu.eval.tta import plan_variant_buckets

        plan = list(plan_variant_buckets(h, w, runner.config))
        assert plan, "every image plans at least the det0 variant"
        for v, bucket, canvas in plan:
            assert bucket in runner.config.tta.buckets
            assert canvas >= max(h, w)
            assert np.isfinite(v.scale) and v.scale > 0
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        out = runner.detect_tta(img)
        assert set(out) == {"bboxes", "scores"}
        assert np.isfinite(out["bboxes"]).all()
        assert np.isfinite(out["scores"]).all()

    def test_run_dataset_matches_per_image(self, runner, rng):
        """Sharded dataset runner == serial per-image TTA (config 5)."""
        from dan_tpu.eval.tta import plan_variant_buckets
        from dan_tpu.parallel.mesh import make_mesh

        images = {
            f"e/img{i}": rng.integers(0, 255, (60 + 8 * i, 80, 3), dtype=np.uint8)
            for i in range(3)
        }
        mesh = make_mesh()
        got = runner.run_dataset(list(images.items()), mesh=mesh)
        assert set(got) == set(images)
        stats = runner.last_run_stats
        assert stats["images"] == len(images)
        assert stats["variants"] == sum(
            len(list(plan_variant_buckets(*img.shape[:2], runner.config)))
            for img in images.values()
        )
        assert stats["bucket_launches"] >= 1
        assert stats["vote_launches"] >= 1
        for k, img in images.items():
            want = runner.detect_tta(img)
            np.testing.assert_allclose(
                got[k]["bboxes"], want["bboxes"], rtol=1e-5, atol=1e-4
            )
            np.testing.assert_allclose(
                got[k]["scores"], want["scores"], rtol=1e-6
            )
        # max_pending=1 forces the incremental drain DURING planning (the
        # default 32 never drains mid-run at fixture scale) — results and
        # launch counts must be identical to the defer-to-the-end path.
        tight = runner.run_dataset(
            list(images.items()), mesh=mesh, max_pending=1
        )
        assert runner.last_run_stats == stats
        for k in images:
            np.testing.assert_array_equal(tight[k]["bboxes"], got[k]["bboxes"])
            np.testing.assert_array_equal(tight[k]["scores"], got[k]["scores"])

    def test_oversized_image_no_crash(self, runner, rng):
        """Images larger than the biggest bucket must round the canvas up
        and cap variant scales, not crash or truncate."""
        img = rng.integers(0, 255, (200, 150, 3), dtype=np.uint8)  # > 128
        out = runner.detect_tta(img)
        assert "bboxes" in out
        # And through the dataset runner too.
        got = runner.run_dataset([("e/big", img)])
        assert "e/big" in got

    def test_flip_symmetric_image_consistency(self, runner, rng):
        """On a horizontally symmetric image, TTA must not error and flip
        variants contribute (smoke only; exact symmetry needs trained net)."""
        half = rng.integers(0, 255, (64, 32, 3), dtype=np.uint8)
        img = np.concatenate([half, half[:, ::-1]], axis=1)
        out = runner.detect_tta(img)
        assert "bboxes" in out

    def test_warmup_then_run_dataset_identical(self, runner, rng):
        """Warmup runs FIRST on a fresh runner (so it, not run_dataset,
        builds every executable with its dummy shapes — the shape-parity
        contract under test), then run_dataset must reuse them and match
        a never-warmed baseline runner exactly."""
        imgs = [
            ("a", rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)),
            ("b", rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)),
        ]
        base = runner.run_dataset(iter(imgs))  # never-warmed baseline

        fresh = TTARunner(runner.params, runner.config)
        n = fresh.warmup([im.shape[:2] for _, im in imgs], threads=4)
        assert n >= 1
        warmed = fresh.run_dataset(iter(imgs))
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                base[k]["bboxes"], warmed[k]["bboxes"]
            )
            np.testing.assert_array_equal(
                base[k]["scores"], warmed[k]["scores"]
            )
