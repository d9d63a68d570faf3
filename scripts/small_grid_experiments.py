"""Small-grid fused-residual-kernel experiments (round-3 VERDICT #3).

The r03 report shows the fused kernel at 36% / 34% of the copy-probe roof
at 64^3 / 96x96x64 vs 63% at the flagship. Hypothesis ladder:

  H1 (pipeline depth): pick_packed_slab maximizes slab size within the
     VMEM budget, which at 64^3 yields sz=16 -> only FOUR programs; with
     double buffering the prologue/epilogue (un-overlapped first DMA +
     last compute) is ~2/4 of the sweep. The flagship runs 24 programs
     (sz=4) where the same ends cost ~2/24. Prediction: smaller sz at
     64^3 gets FASTER despite more per-program overhead.
  H2 (fixed per-call floor): a minimal Pallas kernel (1-plane manual-DMA
     copy) bounds the per-call cost c0; if c0 is ~5+ us, sub-20 us
     kernels cannot reach 50% of a bandwidth roof no matter the schedule
     and the DESIGN.md matrix records the floor.

Usage (TPU host):  PYTHONPATH=/root/repo:$PYTHONPATH python
scripts/small_grid_experiments.py [--grids 64 96] [--szs 2 4 8 16]

Each (grid, sz) cell is ONE new kernel shape == one remote compile
(1-2 min cold); results print as one JSON line per cell.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp


def bound_min_call(py, px):
    """H2: minimal manual-DMA kernel — copy one [py, px] plane HBM->VMEM->
    HBM with a semaphore wait, grid=(1,). Its time bounds the per-call
    floor (grid setup + semaphore init + DMA latency + dispatch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phys_autodiff_tpu.bench import harness

    def kernel(x_hbm, o_hbm, buf, sem_in, sem_out):
        cp = pltpu.make_async_copy(x_hbm, buf, sem_in)
        cp.start()
        cp.wait()
        buf[...] = buf[...] + 1.0
        cp2 = pltpu.make_async_copy(buf, o_hbm, sem_out)
        cp2.start()
        cp2.wait()

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((py, px), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((py, px), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    x = jnp.ones((py, px), jnp.float32)
    ms = harness.time_loop(lambda i, c: call(c), x)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", nargs="*", type=int, default=[64, 96])
    ap.add_argument("--szs", nargs="*", type=int, default=[2, 4, 8, 16])
    ap.add_argument("--budget", type=float, default=64.0,
                    help="_VMEM_BUDGET override (MiB) for the kernels' "
                         "OTHER internal size picks; the sweep FORCES sz "
                         "directly (pick_packed_slab is monkeypatched), so "
                         "an infeasible sz fails at Mosaic compile rather "
                         "than being clamped — the 96x96x64 sz=16 error "
                         "cell in the r04 matrix is that, working as "
                         "intended")
    ap.add_argument("--min-call", action="store_true",
                    help="also run the H2 minimal-kernel floor probe")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from phys_autodiff_tpu.bench import harness
    from phys_autodiff_tpu.pallas import residuals as res
    from phys_autodiff_tpu.utils.config import GridSpec

    res._VMEM_BUDGET = int(args.budget * 1024 * 1024)

    grids = {
        64: GridSpec(nx=64, ny=64, nz=64, hx=0.05, hy=0.05, hz=0.05,
                     dt=1e-3),
        96: GridSpec(nx=96, ny=96, nz=64, hx=0.05, hy=0.05, hz=0.05,
                     dt=1e-3),
        128: GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05,
                      dt=1e-3),
    }

    if args.min_call:
        for py, px in ((32, 128), (96, 128)):
            ms = bound_min_call(py, px)
            print(json.dumps({"exp": "min_call", "plane": [py, px],
                              "ms": round(ms, 6)}), flush=True)

    orig_pick = res.pick_packed_slab
    for key in args.grids:
        g = grids[key]
        fs = harness.random_fields(g)
        if g.nx % 128 == 0:
            packed = jax.block_until_ready(res.pack_fields(fs))
            op = res.residuals_fused_packed
        else:
            packed = jax.block_until_ready(
                res.grid_to_flat(g, res.pack_fields(fs)))
            op = res.residuals_fused_flat
        for sz in args.szs:
            if g.nz % sz != 0:
                continue
            res.pick_packed_slab = lambda gg, max_sz=16, _sz=sz: _sz
            try:
                ms = harness.time_packed_op(lambda p: op(g, p), packed)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                print(json.dumps({
                    "exp": "sz_sweep", "grid": list(g.shape), "sz": sz,
                    "error": str(e).splitlines()[0][:160]}), flush=True)
                continue
            finally:
                res.pick_packed_slab = orig_pick
            n = g.num_cells
            gbs = n * 64 / (ms * 1e-3) / 1e9
            print(json.dumps({
                "exp": "sz_sweep", "grid": list(g.shape), "sz": sz,
                "n_prog": g.nz // sz, "ms": round(ms, 6),
                "gbs": round(gbs, 1),
                "pct_roof": round(100 * gbs / 2850, 1)}), flush=True)


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/small_grid_experiments.py")
    sys.exit(main())
