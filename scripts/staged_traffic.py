"""Adjudicate the staged arm's flagship deficit vs the reference nonfused arm
(round-4 VERDICT "what's weak" #7) with XLA's own buffer accounting.

The one row a hostile reader can quote — staged 0.371 ms vs the reference's
nonfused 0.183 ms kernel-only at 128x96x96 — has a bandwidth explanation the
round-5 two-regime campaign made checkable: the staged arm materializes the
16 derivative intermediates (like src/phys_cuda_nonfused.cu's 26 buffers),
its concurrent working set therefore exceeds the ~125 MB VMEM-residency
window, and it streams HBM at the measured 0.657 TB/s big-buffer ceiling
(docs/captures/big_grid_r5.json) instead of the 2.85 TB/s VMEM-resident rate
the benchmark-grid kernels enjoy. Reference-equivalent staging traffic is
~52 N-array passes (26 buffers written/read once each) = 208 B/cell =
245 MB at the flagship; at 0.657 TB/s that is 373 us — the measured 371 us.
The reference's GPU runs the same staging at ~1.34 TB/s effective (245 MB /
0.183 ms: 5090 HBM + its 96 MB L2 absorbing part).

This script compiles the EXACT timed staged loop (feedback mode, the bench's
own construction) and prints XLA's memory_analysis so the claim rests on the
compiler's buffer assignment, not hand arithmetic: temp bytes ~ the
materialized intermediates; traffic >= 2*temp + args + outputs.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/staged_traffic.py
(cache-warm shapes: the bench compiles this loop every run).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp


def main():
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("staged_traffic")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from phys_autodiff_tpu import ops
    from phys_autodiff_tpu.bench import harness
    from phys_autodiff_tpu.bench.harness import (
        _make_run,
        _residual_feedback_body,
        _residual_feedback_carry,
    )
    from phys_autodiff_tpu.utils.config import GridSpec

    g = GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    fs = harness.random_fields(g)
    run = _make_run(_residual_feedback_body(lambda f: ops.residuals(g, f)))
    compiled = run.lower(
        _residual_feedback_carry(fs), jnp.int32(4)
    ).compile()
    ma = compiled.memory_analysis()
    n = g.num_cells
    out = {
        "grid": "128x96x96",
        "temp_MB": round(ma.temp_size_in_bytes / 1e6, 1),
        "args_MB": round(ma.argument_size_in_bytes / 1e6, 1),
        "output_MB": round(ma.output_size_in_bytes / 1e6, 1),
        # one write + one read per temp byte, plus args in and outputs out:
        "traffic_floor_MB": round(
            (2 * ma.temp_size_in_bytes
             + ma.argument_size_in_bytes
             + ma.output_size_in_bytes) / 1e6, 1,
        ),
        "ref_equiv_MB": round(52 * 4 * n / 1e6, 1),  # 26 buffers w+r
        "ms_at_hbm_ceiling_for_ref_equiv": round(
            52 * 4 * n / 0.657e9, 4
        ),  # 0.657 TB/s measured big-buffer rate
        "measured_ms": 0.371,  # BENCH_r04 flagship staged row
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
