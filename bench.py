"""Headline benchmark. Prints ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: fused residual-kernel throughput at the reference's largest
benchmark grid (128x96x96 = 1,179,648 cells), in grid-cell-iterations/sec.
Baseline: the reference's fused CUDA kernel on an RTX 5090 — 0.11997 ms/iter
== 9.833 G cell-iters/s (docs/BENCHMARK_REPORT.md:53, BASELINE.md "derived
throughput").

Timing: on-device fori_loop slope method (see bench/harness.py docstring) —
the tunnel to the chip has ~25 ms dispatch/sync latency and an unreliable
block_until_ready, so naive host-side loops are meaningless here.

The full four-scope CSV table (reference schema) goes to stderr.
"""

import json
import sys


def main():
    from phys_autodiff_tpu.bench import harness
    from phys_autodiff_tpu.utils.config import GridSpec

    phys_rows = []
    print("# phys,variant,nx,ny,nz,iters,ms", file=sys.stderr, flush=True)
    for nx, ny, nz in harness.REFERENCE_GRIDS:
        g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        for r in harness.bench_phys(g):
            phys_rows.append(r)
            print(r.csv(), file=sys.stderr, flush=True)
    print(
        "# mlp_phys,variant,nx,ny,nz,iters,ms_kernel,ms_phys_e2e,ms_mlp,ms_total",
        file=sys.stderr,
        flush=True,
    )
    g = GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    for r in harness.bench_pipeline(g):  # pipeline at the flagship grid
        print(r.csv(), file=sys.stderr, flush=True)

    # Best arm at the flagship grid. On TPU the staged ops path IS a fused
    # single-pass program (XLA fuses the rolled stencil), so the honest
    # "fused residual kernel" comparison takes the better of the two arms.
    best_ms = min(
        r.ms for r in phys_rows if (r.nx, r.ny, r.nz) == (128, 96, 96)
    )
    n_cells = 128 * 96 * 96
    cells_per_s = n_cells / (best_ms / 1e3)
    baseline_cells_per_s = n_cells / (0.11997 / 1e3)  # RTX 5090 fused kernel

    print(
        json.dumps(
            {
                "metric": "residual_kernel_throughput_128x96x96",
                "value": round(cells_per_s / 1e9, 4),
                "unit": "Gcell_iters_per_s",
                "vs_baseline": round(cells_per_s / baseline_cells_per_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
