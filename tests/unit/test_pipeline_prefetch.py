"""device_prefetch: ordering, completeness, early-stop cleanliness."""
import numpy as np

from dan_tpu.config import DANConfig, MatchConfig, ModelConfig, PreprocessConfig
from dan_tpu.data.pipeline import device_prefetch
from dan_tpu.data.synthetic import synthetic_batch
from dan_tpu.parallel.mesh import make_mesh


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
