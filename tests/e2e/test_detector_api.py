"""Detector API e2e: the config-1 surface (image in -> detection dict out),
plus orbax checkpoint roundtrip."""
import numpy as np
import pytest

import jax

from dan_tpu.api import Detector
from dan_tpu.config import (
    DANConfig,
    MatchConfig,
    ModelConfig,
    PostprocessConfig,
    PreprocessConfig,
    TTAConfig,
)


def tiny_config():
    return DANConfig(
        model=ModelConfig(image_size=64, compute_dtype="float32"),
        preprocess=PreprocessConfig(train_image_size=64, canvas_size=128),
        match=MatchConfig(max_gt=8),
        postprocess=PostprocessConfig(pre_nms_topk=64, max_detections=16),
        tta=TTAConfig(buckets=(64, 128, 256)),
    )


@pytest.fixture(scope="module")
def detector():
    return Detector.from_random(jax.random.PRNGKey(0), tiny_config())


class TestDetectorAPI:
    def test_detection_dict_contract(self, detector, rng):
        img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
        out = detector.detect(img)
        assert set(out) == {"bboxes", "scores"}
        assert out["bboxes"].ndim == 2 and out["bboxes"].shape[1] == 4
        assert out["scores"].shape == (out["bboxes"].shape[0],)
        assert out["bboxes"].shape[0] <= 16
        # Scores sorted descending (NMS emission order).
        s = out["scores"]
        assert (s[:-1] >= s[1:]).all()
        # Boxes within the original image bounds.
        if len(out["bboxes"]):
            assert out["bboxes"][:, [0, 2]].max() <= 120 + 1e-3
            assert out["bboxes"][:, [1, 3]].max() <= 100 + 1e-3
            assert out["bboxes"].min() >= -1e-3

    def test_deterministic(self, detector, rng):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        a = detector.detect(img)
        b = detector.detect(img)
        np.testing.assert_array_equal(a["bboxes"], b["bboxes"])
        np.testing.assert_array_equal(a["scores"], b["scores"])

    def test_bucket_reuse_no_recompile(self, detector, rng):
        # Different image sizes within one bucket share a compiled fn.
        detector.detect(rng.integers(0, 255, (50, 60, 3), dtype=np.uint8))
        n = len(detector._detect_fns)
        detector.detect(rng.integers(0, 255, (40, 45, 3), dtype=np.uint8))
        assert len(detector._detect_fns) == n

    def test_float_input_accepted(self, detector, rng):
        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
        out = detector.detect(img)
        assert "bboxes" in out

    def test_bad_shape_raises(self, detector):
        with pytest.raises(ValueError):
            detector.detect(np.zeros((64, 64), np.uint8))

    def test_detect_batch_matches_single(self, detector, rng):
        """Serving batch path == per-image path (canvas bucket padding must
        not change results: the squash clamps to each image's true extent)."""
        images = [
            rng.integers(0, 255, (50, 60, 3), dtype=np.uint8),
            rng.integers(0, 255, (64, 40, 3), dtype=np.uint8),
            rng.integers(0, 255, (30, 30, 3), dtype=np.uint8),
        ]
        batch_out = detector.detect_batch(images)
        assert len(batch_out) == 3
        for im, got in zip(images, batch_out):
            want = detector.detect(im)
            np.testing.assert_allclose(
                got["bboxes"], want["bboxes"], rtol=1e-5, atol=1e-4
            )
            np.testing.assert_allclose(
                got["scores"], want["scores"], rtol=1e-6
            )

    def test_detect_batch_empty(self, detector):
        assert detector.detect_batch([]) == []

    def test_detect_batch_bad_shape_raises(self, detector, rng):
        with pytest.raises(ValueError):
            detector.detect_batch([rng.integers(0, 255, (50, 60), dtype=np.uint8)])

    def test_detect_batch_pads_to_power_of_two(self, detector, rng):
        imgs = [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8) for _ in range(3)]
        out = detector.detect_batch(imgs)
        assert len(out) == 3  # padded executable, trimmed results
        assert ("batch", 4, 64) in detector._detect_fns

    def test_detect_batch_score_threshold(self, detector, rng):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        full = detector.detect_batch([img])[0]
        if len(full["scores"]) == 0:
            pytest.skip("no detections from random net")
        t = float(np.median(full["scores"]))
        cut = detector.detect_batch([img], score_threshold=t)[0]
        assert (cut["scores"] >= t).all()

    def test_warmup_compiles_buckets(self, detector):
        detector.warmup(buckets=(64, 128))
        assert {64, 128} <= set(detector._detect_fns)

    def test_image_larger_than_buckets(self, detector, rng):
        """Outsized input rounds the canvas up to a /128 multiple."""
        img = rng.integers(0, 255, (300, 260, 3), dtype=np.uint8)
        out = detector.detect(img)
        assert out["bboxes"].shape[1] == 4

    @pytest.mark.parametrize("h,w", [(1, 1), (2, 120), (120, 2)])
    def test_degenerate_image_geometry(self, detector, rng, h, w):
        """1-pixel and extreme-aspect images detect without crashes or
        non-finite outputs (the squash resize + bucket rules see sizes far
        outside the dataset distribution)."""
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        out = detector.detect(img)
        assert np.isfinite(out["bboxes"]).all()
        assert np.isfinite(out["scores"]).all()

    def test_score_threshold_filters(self, detector, rng):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        full = detector.detect(img)
        if len(full["scores"]) == 0:
            pytest.skip("random net produced no detections")
        thresh = float(np.median(full["scores"]))
        cut = detector.detect(img, score_threshold=thresh)
        assert (cut["scores"] >= thresh).all()
        assert len(cut["scores"]) <= len(full["scores"])

    def test_detect_tta_matches_runner(self, detector, rng):
        """Detector.detect_tta == eval.tta.TTARunner.detect_tta (same
        detection dict), with the runner cached across calls."""
        from dan_tpu.eval.tta import TTARunner

        img = rng.integers(0, 255, (80, 64, 3), dtype=np.uint8)
        got = detector.detect_tta(img)
        want = TTARunner(detector.params, detector.config).detect_tta(img)
        np.testing.assert_array_equal(got["bboxes"], want["bboxes"])
        np.testing.assert_array_equal(got["scores"], want["scores"])
        assert detector._tta_runner is not None
        again = detector.detect_tta(img)  # cached-runner path
        np.testing.assert_array_equal(again["bboxes"], got["bboxes"])
        if len(got["scores"]):
            thresh = float(np.median(got["scores"]))
            cut = detector.detect_tta(img, score_threshold=thresh)
            assert (cut["scores"] >= thresh).all()

    def test_detect_tta_dataset_knob_parity(self, detector, rng):
        """detect_tta_dataset threads tta_batch/vote_batch through to
        TTARunner.run_dataset and matches per-image detect_tta results
        (VERDICT r3 item 7: API knob parity with the eval CLI)."""
        imgs = {
            f"im{i}": rng.integers(0, 255, (80, 64, 3), dtype=np.uint8)
            for i in range(3)
        }
        res = detector.detect_tta_dataset(
            imgs.items(), tta_batch=2, vote_batch=2
        )
        assert set(res) == set(imgs)
        for k, im in imgs.items():
            want = detector.detect_tta(im)
            # Not bit-identical: the dataset path packs the vote at
            # vote_batch=2 (different launch shape -> different XLA
            # fusion/rounding in the vote's weighted average) — tight
            # allclose instead.
            np.testing.assert_allclose(
                res[k]["bboxes"], want["bboxes"], rtol=1e-5, atol=1e-4
            )
            np.testing.assert_allclose(
                res[k]["scores"], want["scores"], rtol=1e-5, atol=1e-6
            )

    def test_warmup_tta_covers_sizes(self, detector):
        """warmup_tta pre-builds every (bucket) executable that the given
        sizes need: a later detect_tta hits only cached fns."""
        n = detector.warmup_tta([(80, 64)], tta_batch=1, vote_batch=2)
        assert n >= 1
        runner = detector._tta_runner
        before = set(runner._bucket_fns)
        img = np.zeros((80, 64, 3), np.uint8)
        detector.detect_tta(img)
        assert set(runner._bucket_fns) == before


class TestCheckpointRoundtrip:
    def test_from_checkpoint_train_model_dir(self, detector, rng, tmp_path):
        """eval/demo can point --ckpt straight at a training model_dir:
        restore_params extracts .params from the latest TrainState."""
        import jax

        from dan_tpu.ckpt.orbax_io import save_train_state
        from dan_tpu.train.loop import TrainState

        state = TrainState(
            params=detector.params,
            opt_state={"dummy": np.zeros(3)},
            step=np.int32(7),
        )
        save_train_state(str(tmp_path), 7, state)
        det2 = Detector.from_checkpoint(str(tmp_path), detector.config)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        a = detector.detect(img)
        b = det2.detect(img)
        np.testing.assert_array_equal(a["bboxes"], b["bboxes"])

    def test_orbax_save_load_same_detections(self, detector, rng, tmp_path):
        from dan_tpu.ckpt.orbax_io import restore_params, save_params

        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        want = detector.detect(img)
        save_params(str(tmp_path / "ckpt"), detector.params)
        params2 = restore_params(str(tmp_path / "ckpt"))
        det2 = Detector(params2, detector.config)
        got = det2.detect(img)
        np.testing.assert_array_equal(want["bboxes"], got["bboxes"])
        np.testing.assert_array_equal(want["scores"], got["scores"])
