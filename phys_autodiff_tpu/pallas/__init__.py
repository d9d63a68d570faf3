from phys_autodiff_tpu.pallas.residuals import (
    residuals_fused,
    residuals_fused_packed,
    loss_backward_fused,
    loss_forward_fused,
    loss_forward_fused_packed,
    pack_fields,
    unpack_fields,
    pick_slab_size,
    PACKED_ORDER,
)
from phys_autodiff_tpu.pallas.mlp import (
    generate_fields_fused,
    generate_fields_fused_packed,
    grid_infer_fused,
    fused_loss_pipeline,
)

__all__ = [
    "residuals_fused",
    "residuals_fused_packed",
    "loss_backward_fused",
    "loss_forward_fused",
    "loss_forward_fused_packed",
    "pack_fields",
    "unpack_fields",
    "pick_slab_size",
    "PACKED_ORDER",
    "generate_fields_fused",
    "generate_fields_fused_packed",
    "grid_infer_fused",
    "fused_loss_pipeline",
]
