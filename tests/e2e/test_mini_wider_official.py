"""End-to-end official-protocol AP over the committed mini-WIDER fixture:
the full seam the r1 verdict flagged as untested — eval CLI driven by real
.mat ground-truth files (not the height-based approximation).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIX = os.path.join(REPO, "tests", "fixtures", "mini_wider")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="mini_wider fixture not generated"
)


def test_perfect_predictions_score_only_official_ap(tmp_path):
    """Write the official gt back as predictions -> AP must be 1.0 for all
    three settings through scripts/eval.py --score_only --gt_mats."""
    from dan_tpu.eval.widerface_ap import load_official_gt
    from dan_tpu.eval.writer import write_wider_detections

    gt_boxes, keep_lists, stems = load_official_gt(
        os.path.join(FIX, "eval_tools", "ground_truth")
    )
    pred_dir = tmp_path / "preds"
    for stem in stems:
        b = gt_boxes[stem]
        # Only predict the valid (hard-subset) faces; invalid gt boxes are
        # 'ignored' under the official rule and must not be required.
        keep = keep_lists["hard"][stem]
        b = b[keep] if len(keep) else np.zeros((0, 4))
        scores = np.linspace(0.99, 0.9, num=len(b))
        write_wider_detections(str(pred_dir), stem + ".jpg", b, scores)

    proc = subprocess.run(
        [
            sys.executable,
            "scripts/eval.py",
            "--score_only",
            "--pred_dir",
            str(pred_dir),
            "--gt_mats",
            os.path.join(FIX, "eval_tools", "ground_truth"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if "WIDER FACE" in l][-1]
    vals = {
        kv.split("=")[0]: float(kv.split("=")[1])
        for kv in line.split()
        if "=" in kv
    }
    assert vals["easy"] > 0.99 and vals["medium"] > 0.99 and vals["hard"] > 0.99, line


def test_detector_eval_cli_official_mats(tmp_path):
    """Full inference -> txt writer -> official .mat AP through the CLI
    (random weights: AP is meaningless, the seam is what's under test)."""
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/eval.py",
            "--platform",
            "cpu",
            "--wider_root",
            FIX,
            "--no_tta",
            "--limit",
            "3",
            "--output_dir",
            str(tmp_path / "out"),
            "--gt_mats",
            os.path.join(FIX, "eval_tools", "ground_truth"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if "WIDER FACE" in l][-1]
    vals = {
        kv.split("=")[0]: float(kv.split("=")[1])
        for kv in line.split()
        if "=" in kv
    }
    for s in ("easy", "medium", "hard"):
        assert 0.0 <= vals[s] <= 1.0
    # txt detections written in WIDER layout for the limited images.
    written = []
    for root, _dirs, files in os.walk(tmp_path / "out"):
        written += [f for f in files if f.endswith(".txt")]
    assert len(written) == 3, written
