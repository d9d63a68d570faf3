from phys_autodiff_tpu.ref import oracle, manufactured, mlp_oracle

__all__ = ["oracle", "manufactured", "mlp_oracle"]
from phys_autodiff_tpu.ref import native  # noqa: E402

__all__.append("native")
