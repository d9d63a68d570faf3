from phys_autodiff_tpu.pallas.residuals import (
    residuals_fused,
    loss_backward_fused,
    loss_forward_fused,
    pick_slab_size,
)
from phys_autodiff_tpu.pallas.mlp import (
    generate_fields_fused,
    grid_infer_fused,
)

__all__ = [
    "residuals_fused",
    "loss_backward_fused",
    "loss_forward_fused",
    "pick_slab_size",
    "generate_fields_fused",
    "grid_infer_fused",
]
