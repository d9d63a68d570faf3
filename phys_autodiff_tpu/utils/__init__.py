from phys_autodiff_tpu.utils.config import (
    GridSpec,
    PhysWeights,
    MLPDims,
    CoordNorm,
    MLPGridConfig,
)
from phys_autodiff_tpu.utils.metrics import rel_l2_err, max_abs_err
from phys_autodiff_tpu.utils import export, tolerances

__all__ = [
    "GridSpec",
    "PhysWeights",
    "MLPDims",
    "CoordNorm",
    "MLPGridConfig",
    "export",
    "rel_l2_err",
    "max_abs_err",
    "tolerances",
]
