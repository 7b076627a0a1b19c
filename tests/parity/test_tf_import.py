"""TF-checkpoint importer round-trip (SURVEY.md §7 build step 3): since the
reference ckpt is unavailable (empty mount), export a slim-style TF ckpt
from our own params and re-import it, asserting bit-identity."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

from dan_tpu.ckpt.tf_import import (
    export_tf_checkpoint,
    load_tf_checkpoint,
    map_tf_name,
)
from dan_tpu.config import ModelConfig
from dan_tpu.models.detector import init_detector_params


class TestNameMap:
    def test_slim_vgg_names(self):
        assert map_tf_name("vgg_16/conv1/conv1_1/weights") == (
            "backbone",
            "conv1_1",
            "kernel",
        )
        assert map_tf_name("vgg_16/conv3/conv3_3/biases") == (
            "backbone",
            "conv3_3",
            "bias",
        )
        assert map_tf_name("vgg_16/fc6/weights") == ("backbone", "fc6", "kernel")
        assert map_tf_name("conv6_2/weights") == ("backbone", "conv6_2", "kernel")

    def test_l2norm_and_heads(self):
        assert map_tf_name("conv4_3_norm/gamma") == ("l2norm", "conv4_3", "scale")
        assert map_tf_name("conv4_3_norm_mbox_conf/weights") == (
            "heads",
            "cls_conv4_3",
            "kernel",
        )
        assert map_tf_name("fc7_mbox_loc/biases") == ("heads", "loc_fc7", "bias")

    def test_optimizer_slots_skipped(self):
        assert map_tf_name("vgg_16/conv1/conv1_1/weights/Momentum") is None

    def test_unknown_returns_none(self):
        assert map_tf_name("global_step") is None


class TestRoundtrip:
    def test_export_import_bit_identical(self, tmp_path):
        cfg = ModelConfig(image_size=64)
        params = init_detector_params(jax.random.PRNGKey(42), cfg)
        prefix = str(tmp_path / "fake_ref.ckpt")
        export_tf_checkpoint(
            jax.tree_util.tree_map(np.asarray, params), prefix
        )
        # Perturb nothing; import into a DIFFERENT random init and verify
        # every mapped leaf got overwritten with the exported values.
        imported = load_tf_checkpoint(prefix, cfg, verbose=False)
        for section in ("backbone", "l2norm", "heads", "lfpn"):
            for layer, leaves in params[section].items():
                for leaf, want in leaves.items():
                    got = np.asarray(imported[section][layer][leaf])
                    np.testing.assert_array_equal(
                        got, np.asarray(want), err_msg=f"{section}/{layer}/{leaf}"
                    )

    def test_detector_from_checkpoint_tf_path(self, tmp_path):
        """Config-1 surface: Detector.from_checkpoint on a TF ckpt prefix
        produces identical detections to a Detector built from the params
        directly."""
        import numpy as np

        from dan_tpu.api import Detector
        from dan_tpu.config import (
            DANConfig,
            ModelConfig,
            PostprocessConfig,
            TTAConfig,
        )

        cfg = DANConfig(
            model=ModelConfig(image_size=64, compute_dtype="float32"),
            postprocess=PostprocessConfig(pre_nms_topk=64, max_detections=8),
            tta=TTAConfig(buckets=(64, 128)),
        )
        params = init_detector_params(jax.random.PRNGKey(3), cfg.model)
        prefix = str(tmp_path / "ref.ckpt")
        export_tf_checkpoint(jax.tree_util.tree_map(np.asarray, params), prefix)
        det_direct = Detector(params, cfg)
        det_loaded = Detector.from_checkpoint(prefix, cfg)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (60, 70, 3), dtype=np.uint8)
        a = det_direct.detect(img)
        b = det_loaded.detect(img)
        np.testing.assert_array_equal(a["bboxes"], b["bboxes"])
        np.testing.assert_array_equal(a["scores"], b["scores"])

    def test_classifier_fc_subsampling(self):
        from dan_tpu.ckpt.tf_import import _adapt_vgg_fc

        rng = np.random.default_rng(0)
        fc6 = rng.normal(size=(25088, 4096)).astype(np.float32)
        out = _adapt_vgg_fc(fc6, (3, 3, 512, 1024), "fc6")
        assert out.shape == (3, 3, 512, 1024)
        # Spot-check the subsample mapping: out[0,0,c,o] = fc6_resh[0,0,c,4o].
        resh = fc6.reshape(7, 7, 512, 4096)
        np.testing.assert_array_equal(out[0, 0, 5], resh[0, 0, 5, ::4])
        np.testing.assert_array_equal(out[1, 2], resh[3, 6, :, ::4])

        fc7 = rng.normal(size=(4096, 4096)).astype(np.float32)
        out7 = _adapt_vgg_fc(fc7, (1, 1, 1024, 1024), "fc7")
        assert out7.shape == (1, 1, 1024, 1024)
        np.testing.assert_array_equal(
            out7[0, 0], fc7.reshape(1, 1, 4096, 4096)[0, 0, ::4, ::4]
        )
        bias = rng.normal(size=(4096,)).astype(np.float32)
        np.testing.assert_array_equal(
            _adapt_vgg_fc(bias, (1024,), "fc6"), bias[::4]
        )
        # Non-classifier shapes pass through as unmapped.
        assert _adapt_vgg_fc(np.zeros((3, 3, 8, 8)), (3, 3, 4, 4), "conv1_1") is None

    def test_strict_flags_unmapped(self, tmp_path):
        cfg = ModelConfig(image_size=64)
        params = init_detector_params(jax.random.PRNGKey(0), cfg)
        prefix = str(tmp_path / "ck.ckpt")
        export_tf_checkpoint(jax.tree_util.tree_map(np.asarray, params), prefix)
        # Non-strict passes; lfpn names in the export use placeholder
        # patterns that NAME_RULES also covers, so strict should pass too.
        load_tf_checkpoint(prefix, cfg, strict=False, verbose=False)
