"""Subprocess coverage for the two CLI surfaces no other e2e test drives:
scripts/demo.py (BASELINE.json config 1 — the reference's
simple_dan_demo.py equivalent) and scripts/convert_ckpt.py (SURVEY.md
§3.4 warm-start flow: TF1 ckpt -> orbax params)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _run(argv):
    return subprocess.run(
        [sys.executable] + argv,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )


class TestDemoCLI:
    def test_demo_writes_annotated_image(self, tmp_path):
        import cv2

        img = np.zeros((240, 320, 3), np.uint8)
        img[60:140, 100:180] = 230  # bright square a random net may score
        src = str(tmp_path / "face.jpg")
        cv2.imwrite(src, img[:, :, ::-1])
        out = str(tmp_path / "annotated.jpg")
        r = _run(
            [
                "scripts/demo.py",
                "--platform",
                "cpu",
                "--image",
                src,
                "--out",
                out,
                "--score_threshold",
                "0.0",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "detections" in r.stdout
        assert os.path.exists(out), "annotated image not written"
        annotated = cv2.imread(out)
        assert annotated is not None and annotated.shape[2] == 3

    def test_demo_int8(self, tmp_path):
        """--int8 quantizes (calibrating on the input image by default)
        and the quantized detect graph drives the same demo output."""
        import cv2

        img = np.zeros((240, 320, 3), np.uint8)
        img[60:140, 100:180] = 230
        src = str(tmp_path / "face.jpg")
        cv2.imwrite(src, img[:, :, ::-1])
        r = _run(
            [
                "scripts/demo.py",
                "--platform",
                "cpu",
                "--image",
                src,
                "--int8",
                "--score_threshold",
                "0.0",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "[int8] quantized" in r.stderr
        assert "detections" in r.stdout

    def test_demo_int8_tta_rejected(self, tmp_path):
        import cv2

        img = np.zeros((64, 64, 3), np.uint8)
        src = str(tmp_path / "x.jpg")
        cv2.imwrite(src, img)
        r = _run(
            ["scripts/demo.py", "--image", src, "--int8", "--tta",
             "--platform", "cpu"]
        )
        assert r.returncode != 0
        assert "non-TTA" in r.stderr


class TestConvertCkptCLI:
    def test_tf_ckpt_roundtrips_through_cli(self, tmp_path):
        pytest.importorskip("tensorflow")
        import jax

        from dan_tpu.ckpt.orbax_io import restore_params
        from dan_tpu.ckpt.tf_import import export_tf_checkpoint
        from dan_tpu.config import default_config
        from dan_tpu.models.detector import init_detector_params

        cfg = default_config()
        params = init_detector_params(jax.random.PRNGKey(3), cfg.model)
        prefix = str(tmp_path / "tf" / "model.ckpt-7")
        os.makedirs(os.path.dirname(prefix))
        export_tf_checkpoint(params, prefix)
        out_dir = str(tmp_path / "orbax")
        r = _run(
            [
                "scripts/convert_ckpt.py",
                "--tf_ckpt",
                prefix,
                "--out",
                out_dir,
                "--strict",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        restored = restore_params(out_dir, cfg)
        want = jax.tree_util.tree_leaves(params)
        got = jax.tree_util.tree_leaves(restored)
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(g), rtol=0, atol=0
            )
