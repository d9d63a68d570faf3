from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.models import hash_encoder, ngp
from phys_autodiff_tpu.models.coords import grid_coords
from phys_autodiff_tpu.models.fields import generate_fields, grid_infer, split_channels

__all__ = [
    "mlp",
    "hash_encoder",
    "ngp",
    "grid_coords",
    "generate_fields",
    "grid_infer",
    "split_channels",
]
