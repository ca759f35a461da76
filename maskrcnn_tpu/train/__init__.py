from maskrcnn_tpu.train.state import (
    TrainState,
    create_train_state,
    lr_schedule,
    make_optimizer,
)
from maskrcnn_tpu.train.step import Batch, init_model, make_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "lr_schedule",
    "make_optimizer",
    "Batch",
    "init_model",
    "make_train_step",
]
