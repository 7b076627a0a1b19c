"""Eval protocol tests: AP harness vs hand-computed values, writer
roundtrip, TTA variant planning."""
import numpy as np
import pytest

from dan_tpu.config import DANConfig, TTAConfig
from dan_tpu.eval.widerface_ap import (
    _image_eval,
    _voc_ap,
    approx_difficulty_keep,
    evaluate_widerface,
)
from dan_tpu.eval.writer import read_wider_detections, write_wider_detections
from dan_tpu.eval.tta import pick_bucket, plan_variants


class TestVocAP:
    def test_perfect_detector(self):
        # recall ramps to 1 with precision 1 -> AP 1.
        r = np.array([0.5, 1.0])
        p = np.array([1.0, 1.0])
        assert _voc_ap(r, p) == pytest.approx(1.0)

    def test_half_precision(self):
        r = np.array([1.0])
        p = np.array([0.5])
        assert _voc_ap(r, p) == pytest.approx(0.5)


class TestImageEval:
    def test_basic_matching(self):
        gts = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
        dets = np.array(
            [
                [0, 0, 10, 10, 0.9],  # TP
                [20, 20, 30, 30, 0.8],  # TP
                [50, 50, 60, 60, 0.7],  # FP
            ],
            np.float64,
        )
        pred_recall, proposal = _image_eval(dets, gts, np.array([0, 1]))
        np.testing.assert_array_equal(pred_recall, [1, 2, 2])
        np.testing.assert_array_equal(proposal, [1, 1, 1])

    def test_ignored_gt_neither_tp_nor_fp(self):
        gts = np.array([[0, 0, 10, 10]], np.float64)
        dets = np.array([[0, 0, 10, 10, 0.9]], np.float64)
        pred_recall, proposal = _image_eval(dets, gts, np.zeros(0, np.int64))
        np.testing.assert_array_equal(pred_recall, [0])
        np.testing.assert_array_equal(proposal, [0])  # excluded from precision

    def test_every_det_on_ignored_gt_excluded(self):
        """Official rule: ALL dets whose argmax gt is outside the subset are
        excluded from the proposal pool, not just the first match."""
        gts = np.array([[0, 0, 10, 10]], np.float64)
        dets = np.array(
            [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [0, 1, 10, 11, 0.7]],
            np.float64,
        )
        pred_recall, proposal = _image_eval(dets, gts, np.zeros(0, np.int64))
        np.testing.assert_array_equal(pred_recall, [0, 0, 0])
        np.testing.assert_array_equal(proposal, [0, 0, 0])

    def test_double_detection_is_fp(self):
        gts = np.array([[0, 0, 10, 10]], np.float64)
        dets = np.array(
            [[0, 0, 10, 10, 0.9], [1, 1, 10, 10, 0.8]], np.float64
        )
        pred_recall, proposal = _image_eval(dets, gts, np.array([0]))
        np.testing.assert_array_equal(pred_recall, [1, 1])
        np.testing.assert_array_equal(proposal, [1, 1])  # second counted FP


class TestEvaluateWiderface:
    def test_perfect_predictions_ap_one(self):
        gt = {
            "e/a": np.array([[0, 0, 60, 60], [100, 100, 160, 170]], np.float64),
            "e/b": np.array([[10, 10, 50, 55]], np.float64),
        }
        preds = {
            k: np.concatenate([v, np.full((len(v), 1), 0.9)], 1)
            for k, v in gt.items()
        }
        res = evaluate_widerface(preds, gt)
        for s in ("easy", "medium", "hard"):
            assert res[s] == pytest.approx(1.0, abs=1e-6), res

    def test_missing_detection_lowers_hard_only(self):
        # One small face (height 20: hard-only) missed.
        gt = {
            "e/a": np.array([[0, 0, 60, 60], [100, 100, 115, 120]], np.float64),
        }
        preds = {"e/a": np.array([[0, 0, 60, 60, 0.9]], np.float64)}
        res = evaluate_widerface(preds, gt)
        assert res["easy"] == pytest.approx(1.0, abs=1e-6)
        assert res["medium"] == pytest.approx(1.0, abs=1e-6)
        assert res["hard"] == pytest.approx(0.5, abs=1e-2)

    def test_false_positive_lowers_ap(self):
        gt = {"e/a": np.array([[0, 0, 60, 60]], np.float64)}
        preds = {
            "e/a": np.array(
                [[0, 0, 60, 60, 0.9], [200, 200, 260, 260, 0.95]], np.float64
            )
        }
        res = evaluate_widerface(preds, gt)
        # FP ranks above the TP: precision at full recall is 1/2.
        assert res["easy"] == pytest.approx(0.5, abs=1e-2)

    def test_difficulty_subsets(self):
        boxes = np.array(
            [[0, 0, 10, 60], [0, 0, 10, 35], [0, 0, 10, 10]], np.float64
        )
        np.testing.assert_array_equal(approx_difficulty_keep(boxes, "easy"), [0])
        np.testing.assert_array_equal(
            approx_difficulty_keep(boxes, "medium"), [0, 1]
        )
        np.testing.assert_array_equal(
            approx_difficulty_keep(boxes, "hard"), [0, 1, 2]
        )


class TestWriter:
    def test_roundtrip(self, tmp_path):
        boxes = np.array([[10.0, 20.0, 110.0, 170.0], [5.0, 5.0, 25.0, 30.0]])
        scores = np.array([0.95, 0.4])
        p = write_wider_detections(
            str(tmp_path), "0--Parade/0_Parade_img_1.jpg", boxes, scores
        )
        assert p.endswith("0--Parade/0_Parade_img_1.txt")
        back = read_wider_detections(p)
        np.testing.assert_allclose(back[:, :4], boxes, atol=0.051)
        np.testing.assert_allclose(back[:, 4], scores, atol=1e-6)

    def test_roundtrip_zero_detections(self, tmp_path):
        """An image with no surviving detections writes a valid 0-count
        file and reads back as an empty (0, 5) array (the official format
        keeps the header lines; a missing file would crash the scorer)."""
        p = write_wider_detections(
            str(tmp_path),
            "0--Parade/0_Parade_img_2.jpg",
            np.zeros((0, 4)),
            np.zeros((0,)),
        )
        back = read_wider_detections(p)
        assert back.shape == (0, 5)


class TestTTAPlan:
    CFG = DANConfig(tta=TTAConfig())

    def test_small_image_gets_extra_scale(self):
        variants = plan_variants(300, 300, self.CFG)
        scales = [v.scale for v in variants]
        assert scales[0] == 1.0  # shrink = 1 for small images
        assert any(s == 2.0 for s in scales)
        assert variants[1].flip  # flip test present

    def test_large_image_shrinks(self):
        variants = plan_variants(2000, 3000, self.CFG)
        assert variants[0].scale < 1.0
        # No extra 2.0 pass for big images.
        assert max(v.scale for v in variants) < 2.0 * 1.0

    def test_size_gates(self):
        variants = plan_variants(500, 500, self.CFG)
        for v in variants[2:]:
            if v.scale > 1.0:
                assert v.max_size < np.inf
            else:
                assert v.min_size > 0

    def test_capped_duplicates_deduped(self):
        """An elongated image whose bucket cap collapses several st values
        onto the same absolute scale must not plan identical variants
        (each would be a redundant full forward pass)."""
        variants = plan_variants(100, 8192, self.CFG)
        assert len(variants) == len(set(variants))

    def test_exact_scale_one_is_not_an_enlarging_pass(self):
        """s == 1.0 exactly (cap/shrink rounding) did not enlarge the
        image: it must keep LARGE boxes (min_size gate), per the strict
        bt > 1 rule."""
        for v in plan_variants(640, 640, self.CFG):
            if v.scale == 1.0 and (v.min_size > 0 or v.max_size < np.inf):
                assert v.min_size > 0 and v.max_size == np.inf

    def test_pick_bucket(self):
        assert pick_bucket(100, (256, 640)) == 256
        assert pick_bucket(500, (256, 640)) == 640
        assert pick_bucket(9999, (256, 640)) == 640

    def test_wider_2x_pass_not_capped(self):
        # WIDER images are 1024px wide; the 2.0 extra pass on small images
        # must reach 2048 exactly (round-1 capped it to 1792).
        variants = plan_variants(400, 1024, self.CFG)
        assert max(v.scale for v in variants) == 2.0

    def test_variant_gate_measures(self):
        from dan_tpu.eval.tta import Variant, variant_gate

        boxes = np.array(
            [
                [0, 0, 40, 200],  # min side 40, max side 200, sqrt-area ~89
                [0, 0, 120, 120],  # min side 120, sqrt-area 120
                [0, 0, 20, 25],  # small box
            ],
            np.float64,
        )
        small = Variant(scale=2.0, flip=False, max_size=100.0)
        large = Variant(scale=0.5, flip=False, min_size=30.0)
        # sqrt_area: gates on sqrt(w*h), inclusive.
        np.testing.assert_array_equal(
            variant_gate(boxes, small, "sqrt_area"), [True, False, True]
        )
        np.testing.assert_array_equal(
            variant_gate(boxes, large, "sqrt_area"), [True, True, False]
        )
        # side: S3FD released-code rule (min-side+1 < 100 / max-side+1 > 30).
        np.testing.assert_array_equal(
            variant_gate(boxes, small, "side"), [True, False, True]
        )
        np.testing.assert_array_equal(
            variant_gate(boxes, large, "side"), [True, True, False]
        )
        # A 40x200 sliver separates the two measures from a 90x90 square.
        sliver_vs_square = np.array([[0, 0, 40, 200], [0, 0, 90, 90]], np.float64)
        assert list(variant_gate(sliver_vs_square, small, "side")) == [True, True]
        assert list(variant_gate(sliver_vs_square, small, "sqrt_area")) == [
            True,
            True,
        ]
        tall = np.array([[0, 0, 80, 260]], np.float64)  # sqrt-area 144, min side 80
        assert list(variant_gate(tall, small, "sqrt_area")) == [False]
        assert list(variant_gate(tall, small, "side")) == [True]
