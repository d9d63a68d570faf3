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
from phys_autodiff_tpu.train.loop import make_ngp_train_step
from phys_autodiff_tpu.train import checkpoint, fit_field, resilient
from phys_autodiff_tpu.train.resilient import ResilienceConfig, fit_resilient

__all__ = [
    "fit_field",
    "make_ngp_train_step",
    "resilient",
    "ResilienceConfig",
    "fit_resilient",
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
