from dan_tpu.ckpt.orbax_io import (
    TrainStateSaver,
    latest_step,
    restore_params,
    restore_train_state,
    save_params,
    save_train_state,
)

__all__ = [
    "TrainStateSaver",
    "latest_step",
    "restore_params",
    "restore_train_state",
    "save_params",
    "save_train_state",
]
