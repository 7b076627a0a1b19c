"""TFRecord converter roundtrip on the mini-WIDER fixture."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from dan_tpu.data.tfrecords import convert_to_tfrecords, read_tfrecords
from dan_tpu.data.widerface import load_split

from tests.e2e.test_eval_cli import mini_wider  # noqa: F401 (fixture)


class TestTFRecords:
    def test_roundtrip(self, mini_wider, tmp_path):  # noqa: F811
        root, gt = mini_wider
        records = load_split(root, "val")
        paths = convert_to_tfrecords(records, str(tmp_path), "val", num_shards=2)
        assert len(paths) == 2
        back = {r.rel_path: (r, enc) for r, enc in read_tfrecords(paths)}
        assert len(back) == len(records)
        for rec in records:
            got, encoded = back[rec.rel_path]
            np.testing.assert_allclose(got.boxes, rec.boxes, atol=0.01)
            # Encoded JPEG decodes to the original image.
            import cv2

            img = cv2.imdecode(np.frombuffer(encoded, np.uint8), cv2.IMREAD_COLOR)
            want = cv2.imread(rec.path, cv2.IMREAD_COLOR)
            np.testing.assert_array_equal(img, want)
