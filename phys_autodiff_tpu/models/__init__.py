from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.models import encoders, fourier, hash_encoder, ngp, sample
from phys_autodiff_tpu.models.coords import grid_coords
from phys_autodiff_tpu.models.fields import generate_fields, grid_infer, split_channels

__all__ = [
    "mlp",
    "encoders",
    "fourier",
    "hash_encoder",
    "ngp",
    "sample",
    "grid_coords",
    "generate_fields",
    "grid_infer",
    "split_channels",
]
