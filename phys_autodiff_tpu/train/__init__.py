from phys_autodiff_tpu.train.loop import (
    TrainConfig,
    TrainState,
    init_state,
    loss_fn,
    make_train_step,
    fit,
)
from phys_autodiff_tpu.train import checkpoint

__all__ = [
    "TrainConfig",
    "TrainState",
    "init_state",
    "loss_fn",
    "make_train_step",
    "fit",
    "checkpoint",
]
