from phys_autodiff_tpu.bench.harness import (
    REFERENCE_GRIDS,
    bench_phys,
    bench_pipeline,
    random_fields,
    run_all,
    time_loop,
    time_residual_op,
    time_fieldgen,
    time_scalar_pipeline,
)

__all__ = [
    "REFERENCE_GRIDS",
    "bench_phys",
    "bench_pipeline",
    "random_fields",
    "run_all",
    "time_loop",
    "time_residual_op",
    "time_fieldgen",
    "time_scalar_pipeline",
]
