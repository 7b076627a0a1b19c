"""device_prefetch / iter_prefetch: ordering, completeness, exception
propagation, early-stop cleanliness."""
import numpy as np
import pytest

from dan_tpu.config import DANConfig, MatchConfig, ModelConfig, PreprocessConfig
from dan_tpu.data.pipeline import device_prefetch, iter_prefetch
from dan_tpu.data.synthetic import synthetic_batch
from dan_tpu.parallel.mesh import make_mesh


class TestIterPrefetch:
    def test_order_and_transform(self):
        out = list(iter_prefetch(range(20), depth=3, transform=lambda x: x * x))
        assert out == [i * i for i in range(20)]

    def test_empty(self):
        assert list(iter_prefetch(iter(()), depth=2)) == []

    def test_worker_exception_propagates(self):
        """A decode error must raise in the consumer, never read as a
        clean end-of-stream (silently truncating an eval dataset)."""

        def bad(x):
            if x == 3:
                raise ValueError("decode failed")
            return x

        it = iter_prefetch(range(10), depth=2, transform=bad)
        got = []
        with pytest.raises(ValueError, match="decode failed"):
            for v in it:
                got.append(v)
        assert got == [0, 1, 2]

    def test_early_close_stops_worker(self):
        produced = []

        def gen():
            i = 0
            while True:
                produced.append(i)
                yield i
                i += 1

        it = iter_prefetch(gen(), depth=2)
        assert next(it) == 0
        it.close()
        n = len(produced)
        import time

        time.sleep(0.1)  # a live worker would keep producing
        assert len(produced) <= n + 2  # bounded by queue depth, not growing


def _cfg():
    return DANConfig(
        model=ModelConfig(image_size=64),
        preprocess=PreprocessConfig(train_image_size=64, canvas_size=128),
        match=MatchConfig(max_gt=8),
    )


class TestDevicePrefetch:
    def test_order_and_completeness(self):
        cfg = _cfg()
        mesh = make_mesh()
        host = [synthetic_batch(cfg, 8, seed=i) for i in range(5)]
        out = list(device_prefetch(iter(host), mesh, depth=2))
        assert len(out) == 5
        for hb, db in zip(host, out):
            np.testing.assert_array_equal(np.asarray(db["seed"]), hb["seed"])
            assert db["canvas"].sharding.num_devices == 8

    def test_early_stop_no_hang(self):
        cfg = _cfg()
        mesh = make_mesh()

        def gen():
            i = 0
            while True:  # infinite producer
                yield synthetic_batch(cfg, 8, seed=i)
                i += 1

        it = device_prefetch(gen(), mesh, depth=2)
        next(it)
        next(it)
        it.close()  # generator finalizer must stop the worker cleanly
