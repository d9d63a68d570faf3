"""Residual-kernel DMA experiment matrix (round-2 VERDICT #4).

The packed one-DMA kernel runs ~42 us at the flagship grid against a
26-33 us in-kernel DMA floor (docs/DESIGN.md); round-2 negatives: semaphore
splitting of ONE array, deeper pipelines, BlockSpec-only, wrap padding.
Round-3 candidates measured here (slope method, flagship grid):

    base        the shipping packed kernel (one DMA stream, f32 in/out)
    split       TWO independent source arrays ([6,...] each) with
                independent per-slab DMAs — probes DMA-engine parallelism
                across source buffers (residuals_fused_packed_split)
    mixed_out   f32 in, bf16 residuals out: 64 -> 56 B/cell useful traffic
                (residuals_fused_packed_mixed_out)
    copy_probe  XLA device-to-device copy of the same input bytes — the
                ambient HBM roofline reference

Run on the TPU host (one TPU process at a time; see CLAUDE.md):
    PYTHONPATH=.:$PYTHONPATH python scripts/dma_experiments.py [nx ny nz]
"""

import sys

import jax
import jax.numpy as jnp

from phys_autodiff_tpu.bench import harness
from phys_autodiff_tpu.pallas.residuals import (
    pack_fields,
    residuals_fused_packed,
    residuals_fused_packed_mixed_out,
    residuals_fused_packed_split,
)
from phys_autodiff_tpu.utils.config import GridSpec


def main(nx=128, ny=96, nz=96):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    n = g.num_cells
    fs = harness.random_fields(g)
    packed = jax.block_until_ready(pack_fields(fs))
    sigma6 = jax.block_until_ready(packed[:6].copy())
    u6 = jax.block_until_ready(packed[6:].copy())

    def report(name, ms, bytes_per_cell):
        gbs = n * bytes_per_cell / (ms * 1e-3) / 1e9
        print(f"{name:12s} {ms * 1e3:8.1f} us   {gbs:7.0f} GB/s "
              f"({bytes_per_cell} B/cell)", flush=True)

    ms = harness.time_packed_op(lambda p: residuals_fused_packed(g, p), packed)
    report("base", ms, 64)

    ms = harness.time_op(
        lambda s6: residuals_fused_packed_split(g, s6, u6), sigma6
    )
    report("split", ms, 64)

    ms = harness.time_packed_op(
        lambda p: residuals_fused_packed_mixed_out(g, p), packed
    )
    report("mixed_out", ms, 56)

    # ambient roofline: a full read+write pass over the input bytes. NOT
    # probe/reduce mode — an XLA elementwise op would be narrowed (probe) or
    # fused into the reduction without materializing (reduce). Carrying the
    # scaled buffer forward forces the full 56 MB write each iteration; the
    # runtime scalar blocks constant folding.
    def copy_body(i, carry):
        acc, x = carry
        y = x * (jnp.float32(1.0) + acc * jnp.float32(1e-30))
        return acc + y.reshape(-1)[0] * jnp.float32(1e-6), y

    ms = harness.time_loop(copy_body, (jnp.float32(0.0), packed))
    report("copy_probe", ms, 96)  # 12 planes read + 12 written


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/dma_experiments.py")
    if len(sys.argv) not in (1, 4):
        sys.exit("usage: python scripts/dma_experiments.py [nx ny nz]")
    dims = [int(a) for a in sys.argv[1:4]]
    main(*dims) if dims else main()
