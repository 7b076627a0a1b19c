"""Native (C++) eval kernels vs their numpy oracles."""
import numpy as np
import pytest

from dan_tpu import native
from dan_tpu.eval import widerface_ap

from tests import oracles


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNative:
    def test_bbox_overlaps_vs_oracle(self, lib, rng):
        a = rng.uniform(0, 100, (23, 4))
        b = rng.uniform(0, 100, (11, 4))
        a = np.concatenate([np.minimum(a[:, :2], a[:, 2:]), np.maximum(a[:, :2], a[:, 2:])], -1)
        b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], -1)
        got = native.bbox_overlaps(a, b)
        want = oracles.iou_matrix(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_image_eval_vs_numpy(self, lib, rng):
        for seed in range(5):
            r = np.random.default_rng(seed)
            n, m = int(r.integers(1, 40)), int(r.integers(0, 15))
            xy = r.uniform(0, 80, (n, 2))
            wh = r.uniform(2, 30, (n, 2))
            dets = np.concatenate(
                [xy, xy + wh, r.uniform(0, 1, (n, 1))], axis=-1
            )
            dets = dets[np.argsort(-dets[:, 4], kind="stable")]
            gxy = r.uniform(0, 80, (m, 2))
            gwh = r.uniform(2, 30, (m, 2))
            gts = np.concatenate([gxy, gxy + gwh], axis=-1)
            keep = np.nonzero(r.uniform(size=m) > 0.3)[0]
            ignore = np.ones(m, bool)
            ignore[keep] = False
            got = native.image_eval(dets, gts, ignore, 0.5)
            # numpy reference path (bypass the native fast path)
            want_pr = np.zeros(n, np.int64)
            want_prop = np.ones(n, np.int64)
            overlaps = widerface_ap._bbox_overlaps(dets[:, :4], gts)
            matched = np.zeros(m, bool)
            rec = 0
            for i in range(n):
                if m:
                    j = int(np.argmax(overlaps[i]))
                    if overlaps[i, j] >= 0.5:
                        if ignore[j]:
                            want_prop[i] = 0
                        elif not matched[j]:
                            matched[j] = True
                            rec += 1
                want_pr[i] = rec
            np.testing.assert_array_equal(got[0], want_pr)
            np.testing.assert_array_equal(got[1], want_prop)

    def test_ap_identical_with_and_without_native(self, rng, monkeypatch):
        gt = {
            "e/a": np.array([[0, 0, 60, 60], [100, 100, 160, 170]], np.float64),
            "e/b": np.array([[10, 10, 50, 55]], np.float64),
        }
        preds = {
            "e/a": np.array([[1, 1, 59, 61, 0.9], [200, 200, 250, 260, 0.7]]),
            "e/b": np.array([[10, 10, 50, 55, 0.8]]),
        }
        with_native = widerface_ap.evaluate_widerface(preds, gt)
        monkeypatch.setattr(native, "image_eval", lambda *a, **k: None)
        without = widerface_ap.evaluate_widerface(preds, gt)
        assert with_native == without
