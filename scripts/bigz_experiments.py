"""Diagnose the big-grid throughput cliff (round-5 campaign).

Findings — FINAL (2026-08-20, this script + HLO inspection):
  * nz <= 96 at 128x128 planes: XLA places the packed input AND the output
    in VMEM (S(1) layouts — 75 + 50 MB fit the 128 MB VMEM), so the
    flagship-class numbers measure the VMEM-resident regime. (The same is
    true of the reference's benchmark grids vs its GPU's 96 MB L2 — the
    comparison is like-for-like.)
  * nz >= 192: the packed input spills to HBM; the loop-entry copy is
    one-time (slope cancels it); the kernel becomes genuinely HBM-bound.
  * The old 2.85 TB/s "copy ceiling" was measured VMEM-resident (56 MB
    flagship buffer) and is the WRONG denominator for HBM-streamed grids:
    a single-buffer scaled-copy at 302/604 MB measures 0.655/0.657 TB/s
    read+write (~80% of HBM spec) — the honest big-grid ceiling.
  * Against it, the kernel measured: nz=192/384 at 0.60 TB/s-equiv (91%,
    flattered — the <=100 MB output stays VMEM-resident there) and
    nz=768 at 0.481 TB/s-equiv with both sides streamed = 73% of the
    measured HBM ceiling.
  * The two-buffer ping-pong variant of the copy probe reads 0.22 TB/s —
    XLA materializes the b' = a pass-through as a second full copy; the
    single-buffer scaled-copy (dma_experiments.py's structure) is the one
    to trust at HBM scale.

This sweep therefore measures (a) the kernel at fixed 128x128 planes with
growing nz, and (b) an honest HBM copy bandwidth at matching buffer sizes:
a generational ping-pong (a' = b * eps, b' = a) whose products are carried,
so every iteration must read one buffer and materialize the other —
structurally DCE-proof, the same soundness class as the residual feedback
loop.

    PYTHONPATH=.:$PYTHONPATH python scripts/bigz_experiments.py
"""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phys_autodiff_tpu.bench import bigbench
from phys_autodiff_tpu.bench.harness import time_loop, time_packed_op
from phys_autodiff_tpu.pallas.residuals import (
    pack_fields,
    pick_slab_size,
    residuals_fused_packed,
)
from phys_autodiff_tpu.utils.config import GridSpec


def hbm_copy_tbs(nbytes: int, seed: int = 3) -> float:
    """Measured read+write bandwidth of a full-buffer elementwise pass at
    `nbytes` per buffer: ping-pong a' = b * eps, b' = a with both buffers
    carried (materialization forced by the carry, nothing loop-invariant).
    Returns TB/s of (read + write) traffic."""
    n = nbytes // 4
    a = jax.random.normal(jax.random.PRNGKey(seed), (n,), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(seed + 1), (n,), jnp.float32)

    def body(i, carry):
        eps, x, y = carry
        return eps, y * eps, x

    ms = time_loop(body, (jnp.float32(1.0000001), a, b))
    return nbytes * 2 / (ms / 1e3) / 1e12


def main():
    for nz in (96, 192, 384, 768):
        g = GridSpec(nx=128, ny=128, nz=nz, hx=0.05, hy=0.05, hz=0.05,
                     dt=1e-3)
        cells = g.num_cells
        fs = bigbench.device_random_fields(g)
        packed = jax.block_until_ready(pack_fields(fs))
        ms = time_packed_op(lambda p: residuals_fused_packed(g, p), packed)
        gcell = cells / (ms / 1e3) / 1e9
        tbs = cells * 64 / (ms / 1e3) / 1e12
        print(
            f"kernel nz={nz:4d} sz={pick_slab_size(g)} ms={ms:.5f} "
            f"{gcell:6.1f} Gcell/s  {tbs:5.3f} TB/s-equiv",
            flush=True,
        )
        copy_tbs = hbm_copy_tbs(cells * 12 * 4)
        print(f"copy   nz={nz:4d} ({cells*12*4/1e6:.0f} MB/buffer): "
              f"{copy_tbs:5.3f} TB/s read+write", flush=True)


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/bigz_experiments.py")
    sys.exit(main())
