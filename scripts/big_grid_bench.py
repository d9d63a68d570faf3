"""Big-grid hardware section (round-4 VERDICT #1): parity + timing for the
fused kernels and the fused training step at 256-class grids — the scale
the reference's 12*N-float memory ceiling never reached
(/root/reference/docs/PLAN_MLP_SMOKE_INTEGRATION.md:55; its largest
benchmark grid is 1.18 M cells, these are 12.6 / 16.8 M — the second grid
has exactly 256^3 cells, shaped 128x128x1024: flagship-class planes with
the scale in streamed/sharded z; see bench/bigbench.py's module docstring
for the two measured reasons).

Run from the repo root (real TPU):

    PYTHONPATH=.:$PYTHONPATH python scripts/big_grid_bench.py

Writes the capture to BOTH build/big_grid_r5.json and
docs/captures/big_grid_r5.json (build/ is wiped by environment resets —
the round-3 fit_results.json lesson), and prints the rows as it goes.

Parity doctrine: residual fields at the fused-vs-staged bounds
(utils/tolerances.py FUSED_VS_STAGED_REL/MAX = 1e-7/1e-6); the scalar loss
at 1e-5 — two independent f32 tree-reductions of 16.8 M terms carry
~eps*log2(N) ≈ 1.5e-6 of reduction-order noise, so the 1e-6 bound used at
the 1.18 M-cell grids (where the referee is the host-f64 reduction; a
268 MB/plane fetch here would time the tunnel, not the chip) is not
meaningful at this N.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phys_autodiff_tpu.bench import bigbench
from phys_autodiff_tpu.utils import tolerances as tol
from phys_autodiff_tpu.utils.config import GridSpec

FAILURES = []


def check(name, err, bound):
    ok = err <= bound
    print(f"  {'PASS' if ok else 'FAIL'} {name}: {err:.3e} (<= {bound:.0e})",
          flush=True)
    if not ok:
        FAILURES.append(name)
    return ok


def main():
    out = {"grids": [], "baseline_note": (
        "reference fused CUDA kernel tops out at 128x96x96 = 1.18 M cells "
        "(0.11997 ms => 9.83 Gcell/s, BASELINE.md); no reference row exists "
        "at these sizes — its 12*N-float storage plan caps the grid"
    )}
    for nx, ny, nz in bigbench.BIG_GRIDS:
        g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        cells = g.num_cells
        print(f"=== {nx}x{ny}x{nz} = {cells/1e6:.2f} M cells ===", flush=True)
        entry = {"nx": nx, "ny": ny, "nz": nz, "cells": cells}

        t0 = time.time()
        par = bigbench.big_parity(g)
        entry["parity"] = par
        entry["parity_pass"] = all([
            check(f"resid rel {nx}x{ny}x{nz}", par["resid_rel"],
                  tol.FUSED_VS_STAGED_REL),
            check(f"resid max/|ref| {nx}x{ny}x{nz}", par["resid_max_scaled"],
                  tol.FUSED_VS_STAGED_MAX),
            check(f"loss L_sigma rel {nx}x{ny}x{nz}", par["loss_sigma_rel"],
                  1e-5),
            check(f"loss L_u rel {nx}x{ny}x{nz}", par["loss_u_rel"], 1e-5),
        ])
        print(f"  parity block: {time.time()-t0:.1f}s", flush=True)

        rows = bigbench.big_phys_rows(g)
        entry["phys"] = []
        for r in rows:
            bpc = 32 if "bf16" in r.variant else 64
            roof = bigbench.roofline_pct(r.ms, cells, bpc)
            gcell = cells / (r.ms / 1e3) / 1e9
            entry["phys"].append({
                "variant": r.variant, "ms": r.ms,
                "gcell_per_s": round(gcell, 3),
                "roofline_pct": round(roof, 1),
            })
            print(f"  {r.csv()}  ({gcell:.1f} Gcell/s, {roof:.1f}% of the "
                  "0.657 TB/s measured HBM copy ceiling)", flush=True)

        ms_loss = bigbench.big_loss_ms(g)
        entry["loss_fused_ms"] = ms_loss
        print(f"  loss,fused,{nx},{ny},{nz},{ms_loss:.5f}", flush=True)

        for variant, ms in bigbench.big_train_ms(g).items():
            entry[f"train_{variant}_ms"] = ms
            print(f"  train,{variant},{nx},{ny},{nz},128,{ms:.5f}", flush=True)

        out["grids"].append(entry)

    out["failures"] = FAILURES
    blob = json.dumps(out, indent=1)
    os.makedirs("build", exist_ok=True)
    for path in ("build/big_grid_r5.json", "docs/captures/big_grid_r5.json"):
        with open(path, "w") as f:
            f.write(blob + "\n")
        print(f"wrote {path}", flush=True)
    if FAILURES:
        print("FAILURES:", FAILURES)
        return 1
    print("ALL PASS")
    return 0


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/big_grid_bench.py")
    sys.exit(main())
