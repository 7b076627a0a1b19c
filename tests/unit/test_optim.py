"""LR schedule semantics (SURVEY.md §2 'Optimizer/schedule' [K]): the
piecewise decay boundaries are ABSOLUTE training steps, with warmup as a
multiplicative ramp that must not shift them."""
import dataclasses

import numpy as np

from dan_tpu.config import default_config
from dan_tpu.train.optim import make_lr_schedule


class TestLRSchedule:
    def test_decay_boundaries_are_absolute(self):
        cfg = default_config().train
        s = make_lr_schedule(cfg)
        b0 = cfg.lr_boundaries[0]
        lr = cfg.learning_rate
        assert np.isclose(float(s(0)), lr)
        assert np.isclose(float(s(b0 - 1)), lr)
        assert np.isclose(float(s(b0 + 1)), lr * cfg.lr_factors[1])

    def test_warmup_ramps_without_shifting_boundaries(self):
        """optax.join_schedules would feed the base schedule
        step - warmup_steps, firing every decay warmup_steps late; the
        boundaries must stay at their configured absolute steps."""
        cfg = dataclasses.replace(default_config().train, warmup_steps=2000)
        s = make_lr_schedule(cfg)
        lr = cfg.learning_rate
        assert np.isclose(float(s(0)), lr * 0.1)
        assert np.isclose(float(s(1000)), lr * 0.55)
        assert np.isclose(float(s(2000)), lr)
        b0 = cfg.lr_boundaries[0]
        assert np.isclose(float(s(b0 - 1)), lr)
        assert np.isclose(float(s(b0 + 1)), lr * cfg.lr_factors[1]), (
            "decay boundary shifted by warmup"
        )
