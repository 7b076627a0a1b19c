"""Golden-drift guard over the committed mini-WIDER fixture
(SURVEY.md §4 items 2+5; VERDICT r1 item 7).

The goldens under tests/fixtures/mini_wider/goldens/ were generated ONCE by
make_mini_wider.py (CPU, f32 compute, PRNGKey(0) random init) and are
committed; these tests re-run the current code over the frozen inputs and
compare.  A failure means detector/postprocess behavior drifted — either a
bug, or a deliberate change that requires regenerating the goldens and
reviewing the diff.
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "mini_wider")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="mini_wider fixture not generated"
)


def _cfg():
    from dan_tpu.config import default_config

    cfg = default_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
        postprocess=dataclasses.replace(cfg.postprocess, use_pallas_nms=False),
    )


class TestFixtureDataset:
    def test_bbx_gt_parses(self):
        from dan_tpu.data.widerface import load_split

        records = load_split(FIX, "val")
        assert len(records) == 20
        assert sum(len(r.boxes) for r in records) > 20
        # Invalid faces are dropped by default, kept with keep_invalid.
        all_records = load_split(FIX, "val", keep_invalid=True)
        assert sum(len(r.boxes) for r in all_records) > sum(
            len(r.boxes) for r in records
        )
        for r in records:
            assert os.path.exists(r.path), r.path

    def test_official_mats_match_txt(self):
        from dan_tpu.data.widerface import load_split
        from dan_tpu.eval.widerface_ap import load_official_gt

        gt_boxes, keep_lists, stems = load_official_gt(
            os.path.join(FIX, "eval_tools", "ground_truth")
        )
        records = load_split(FIX, "val", keep_invalid=True)
        assert len(stems) == len(records)
        for r in records:
            stem = os.path.splitext(r.rel_path)[0]
            np.testing.assert_allclose(gt_boxes[stem], r.boxes, atol=1e-6)
            # Subsets nested: easy ⊆ medium ⊆ hard.
            e = set(keep_lists["easy"][stem].tolist())
            m = set(keep_lists["medium"][stem].tolist())
            h = set(keep_lists["hard"][stem].tolist())
            assert e <= m <= h


class TestModelGolden:
    def test_forward_matches_golden(self):
        g = np.load(os.path.join(FIX, "goldens", "model_io.npz"))
        cfg = _cfg()
        from dan_tpu.models.detector import detector_forward, init_detector_params
        from dan_tpu.ops.preprocess import normalize_image

        params = init_detector_params(jax.random.PRNGKey(0), cfg.model)
        x = normalize_image(
            jnp.asarray(g["images"]).astype(jnp.float32), cfg.preprocess
        )
        cls_logits, loc_preds = jax.jit(
            lambda p, x: detector_forward(p, x, cfg.model)
        )(params, x)
        # f32 CPU forward: tolerances absorb XLA-version fusion differences;
        # anything beyond this is real drift.
        np.testing.assert_allclose(
            np.asarray(cls_logits), g["cls_logits"], rtol=1e-4, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(loc_preds), g["loc_preds"], rtol=1e-4, atol=5e-4
        )


class TestPostprocessGolden:
    def test_pipeline_matches_golden(self):
        """Current XLA postprocess over the FROZEN logits must reproduce the
        committed detections (input is frozen, so this isolates decode/
        filter/top-k/NMS drift from model drift)."""
        g = np.load(os.path.join(FIX, "goldens", "model_io.npz"))
        gp = np.load(os.path.join(FIX, "goldens", "postprocess.npz"))
        cfg = _cfg()
        size = cfg.model.image_size
        from dan_tpu.box.anchors import generate_anchors_np
        from dan_tpu.ops.postprocess import postprocess_batch

        anchors = jnp.asarray(generate_anchors_np(cfg.anchors, size, size))
        res = jax.jit(
            lambda c, l: postprocess_batch(
                c, l, anchors, cfg.anchors, cfg.postprocess,
                float(size), float(size),
            )
        )(jnp.asarray(g["cls_logits"]), jnp.asarray(g["loc_preds"]))
        np.testing.assert_array_equal(np.asarray(res["valid"]), gp["valid"])
        np.testing.assert_allclose(
            np.asarray(res["bboxes"]), gp["boxes"], rtol=1e-5, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res["scores"]), gp["scores"], rtol=1e-5, atol=1e-5
        )

    def test_pipeline_matches_f64_oracle(self):
        """The committed pipeline detections match the committed independent
        f64 oracle run (same frozen logits): same count, same greedy order
        for ≥98% of rows.  (Random-init logits produce millions of near-tie
        candidates; an f32-vs-f64 IoU that straddles the 0.3 threshold flips
        the suppression of a handful of boxes — genuine drift flips far
        more.)"""
        gp = np.load(os.path.join(FIX, "goldens", "postprocess.npz"))
        for b in range(2):
            ob = gp[f"oracle_boxes_{b}"]
            os_ = gp[f"oracle_scores_{b}"]
            n = int(gp["valid"][b].sum())
            assert n == len(ob)
            row_ok = (
                np.isclose(gp["boxes"][b, :n], ob, rtol=1e-4, atol=5e-3).all(-1)
                & np.isclose(gp["scores"][b, :n], os_, rtol=1e-5, atol=1e-5)
            )
            assert row_ok.mean() >= 0.98, (b, int((~row_ok).sum()), n)


class TestTTAGolden:
    """Drift lock for the FULL pyramid+flip+vote eval protocol (VERDICT r2
    item 6): frozen fixture images through the real planning/gating/vote
    code paths.  Goldens from make_mini_wider.py write_tta_golden (tiny
    64px random-init model, so the lock is on protocol behavior, not
    trained weights)."""

    @pytest.fixture(scope="class")
    def golden(self):
        return np.load(os.path.join(FIX, "goldens", "tta.npz"))

    @pytest.fixture(scope="class")
    def runner(self):
        import sys

        sys.path.insert(0, os.path.dirname(FIX))
        from make_mini_wider import tta_golden_config

        from dan_tpu.eval.tta import TTARunner
        from dan_tpu.models.detector import init_detector_params

        cfg = tta_golden_config()
        params = init_detector_params(jax.random.PRNGKey(0), cfg.model)
        return TTARunner(params, cfg)

    def _images(self, golden):
        from dan_tpu.data.widerface import load_image_rgb

        return [
            load_image_rgb(os.path.join(FIX, "WIDER_val", "images", rel))
            for rel in golden["rels"]
        ]

    def test_plan_matches_golden(self, golden, runner):
        """Variant planning (shrink rule, scale list, gates, bucket and
        canvas selection) is bit-stable for the frozen sizes."""
        from dan_tpu.eval.tta import plan_variant_buckets

        for gi in range(len(golden["rels"])):
            h, w = golden[f"size_{gi}"]
            plan = np.asarray(
                [
                    (v.scale, float(v.flip), v.max_size, v.min_size,
                     float(b), float(c))
                    for v, b, c in plan_variant_buckets(
                        int(h), int(w), runner.config
                    )
                ],
                np.float64,
            )
            np.testing.assert_array_equal(plan, golden[f"plan_{gi}"])

    def test_prevote_dets_match_golden(self, golden, runner):
        """Per-variant post-NMS post-gate detections reproduce the frozen
        golden (locks resize/forward/decode/NMS/gating together)."""
        for gi, img in enumerate(self._images(golden)):
            boxes, scores, valid = runner.collect_variant_dets(img)
            np.testing.assert_array_equal(valid, golden[f"prevote_valid_{gi}"])
            np.testing.assert_allclose(
                boxes, golden[f"prevote_boxes_{gi}"], rtol=1e-4, atol=1e-3
            )
            np.testing.assert_allclose(
                scores, golden[f"prevote_scores_{gi}"], rtol=1e-5, atol=1e-6
            )

    def test_final_dets_match_golden(self, golden, runner):
        """detect_tta end-to-end reproduces the frozen fused output."""
        for gi, img in enumerate(self._images(golden)):
            out = runner.detect_tta(img)
            np.testing.assert_allclose(
                out["bboxes"], golden[f"final_boxes_{gi}"], rtol=1e-4, atol=1e-3
            )
            np.testing.assert_allclose(
                out["scores"], golden[f"final_scores_{gi}"], rtol=1e-5, atol=1e-6
            )

    def test_vote_matches_f64_oracle(self, golden, runner):
        """The committed fused output equals an INDEPENDENT f64 numpy
        bbox-vote (tests/oracles.py) over the committed pre-vote dets —
        the vote stage itself is pinned to first principles, not to the
        device implementation."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import oracles

        thr = runner.config.postprocess.vote_iou_threshold
        max_out = runner.config.postprocess.max_detections
        for gi in range(len(golden["rels"])):
            valid = golden[f"prevote_valid_{gi}"]
            sel = valid & (golden[f"prevote_scores_{gi}"] > 0.0)
            dets = np.concatenate(
                [
                    golden[f"prevote_boxes_{gi}"][sel],
                    golden[f"prevote_scores_{gi}"][sel, None],
                ],
                axis=1,
            )
            want = oracles.bbox_vote(dets, iou_threshold=thr, max_out=max_out)
            got_b = golden[f"final_boxes_{gi}"]
            got_s = golden[f"final_scores_{gi}"]
            assert len(want) == len(got_b), (gi, len(want), len(got_b))
            np.testing.assert_allclose(got_b, want[:, :4], rtol=1e-4, atol=5e-3)
            np.testing.assert_allclose(got_s, want[:, 4], rtol=1e-5, atol=1e-6)
