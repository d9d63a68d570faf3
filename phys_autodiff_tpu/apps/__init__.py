"""Applications built ON the framework (not part of the parity core).

The reference repo has no application layer — its only executables are
tests and benchmarks (SURVEY.md §1 L3). These modules demonstrate the
framework serving downstream consumers:

  * apps.advect — tracer-particle advection through a learned velocity
    field (the north-star "particles * steps / sec" workload).
  * apps.euler — incompressible Euler smoke stepper (advect / buoyancy /
    divergence-free projection) assembled from transport + ops.projection.
  * apps.transport — gather-free semi-Lagrangian scalar advection on the
    grid (CFL<=1 roll+select trilinear; 3000x the gather formulation).
"""

from phys_autodiff_tpu.apps import advect, euler, transport  # noqa: F401

__all__ = ["advect", "euler", "transport"]
