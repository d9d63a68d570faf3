from phys_autodiff_tpu.train.loop import (
    TrainConfig,
    TrainState,
    init_state,
    loss_fn,
    make_train_step,
    make_train_epoch,
    fit,
    fit_scan,
    make_generic_train_step,
)
from phys_autodiff_tpu.train import checkpoint

__all__ = [
    "TrainConfig",
    "TrainState",
    "init_state",
    "loss_fn",
    "make_train_step",
    "make_train_epoch",
    "fit",
    "fit_scan",
    "make_generic_train_step",
    "checkpoint",
]
