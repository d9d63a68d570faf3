from phys_autodiff_tpu.ops.stencil import FieldSnapshots, residuals, shift, central_diff
from phys_autodiff_tpu.ops import diagnostics, diffusion, obstacles, projection
from phys_autodiff_tpu.ops.loss import (
    loss_forward,
    loss_forward_f64,
    loss_backward,
    loss_terms,
    total_loss,
)

__all__ = [
    "FieldSnapshots",
    "diagnostics",
    "diffusion",
    "obstacles",
    "projection",
    "residuals",
    "shift",
    "central_diff",
    "loss_forward",
    "loss_forward_f64",
    "loss_backward",
    "loss_terms",
    "total_loss",
]
