from dan_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    preprocess_and_match,
)
from dan_tpu.train.loss import detection_loss, smooth_l1
from dan_tpu.train.optim import make_lr_schedule, make_optimizer

__all__ = [
    "TrainState",
    "create_train_state",
    "detection_loss",
    "make_lr_schedule",
    "make_optimizer",
    "make_sharded_train_step",
    "make_train_step",
    "preprocess_and_match",
    "smooth_l1",
]
