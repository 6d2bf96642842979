from ich_tpu.train.state import TrainState, create_train_state, make_optimizer
from ich_tpu.train.segmentation2d import UNet2D
from ich_tpu.train.checkpoint import (
    load_checkpoint,
    load_params,
    save_checkpoint,
    save_params,
    transfer_weights,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "save_checkpoint",
    "load_checkpoint",
    "save_params",
    "load_params",
    "transfer_weights",
]
