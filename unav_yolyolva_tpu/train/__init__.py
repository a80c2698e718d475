from .optim import make_optimizer, make_schedule, decay_mask
from .state import TrainState, create_train_state
from .step import (
    make_train_step,
    make_eval_step,
    build_targets,
    precompile_train_step,
    precompile_eval_step,
)
from .checkpoint import save_checkpoint, load_checkpoint
from .loop import train_one_epoch, valid_one_epoch
from .ema import ema_update

__all__ = [
    "make_optimizer",
    "make_schedule",
    "decay_mask",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "precompile_train_step",
    "precompile_eval_step",
    "build_targets",
    "save_checkpoint",
    "load_checkpoint",
    "train_one_epoch",
    "valid_one_epoch",
    "ema_update",
]
