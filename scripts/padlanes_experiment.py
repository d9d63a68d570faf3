"""Padded-lane residual kernel experiment (round-5; attacks round-4 VERDICT
"what's weak" #1 — the 96x96x64 grid at 34% roofline, the thinnest margin
over the reference).

The round-4 matrix pinned the unaligned-nx gap on the flat layout's
cyclic-shift select chains (65.8 ps/cell at nx=96 vs the packed kernel's
35.4 at nx=128). This arm takes the OPPOSITE trade the round-2 note
dismissed a priori: pad nx up to the next 128 multiple and keep the packed
kernel's pure-roll shifts. Arithmetic:

    padded time ~ pad_ratio * packed_per_cell = (128/96) * 35.4 = 47.2 ps/cell
                  (+ 2 boundary selects per x-shift, the mega kernels' cost)
    flat time   = 65.8 ps/cell (measured, round 4)

Prediction: ~28-33 us vs the flat kernel's 39.5 at 96x96x64 (win), and a
LOSS at 64^3 where the pad ratio is 2 (2 * 35.4 > 61.6). Both cells print;
the 64^3 negative bounds the routing policy (pad only when ratio <= 4/3).

Usage (TPU host):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/padlanes_experiment.py
    [--skip64]

Each grid is ~2 new kernel shapes == remote compiles (1-2 min cold each).
One JSON line per cell.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp


def main():
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("padlanes_experiment")

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip64", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from phys_autodiff_tpu.bench import harness
    from phys_autodiff_tpu.pallas.residuals import (
        flat_to_grid,
        loss_forward_fused_flat,
        loss_forward_fused_padlanes,
        pack_fields_flat,
        pack_fields_pad,
        pad_to_grid,
        residuals_fused_flat,
        residuals_fused_flat_bf16,
        residuals_fused_padlanes,
        residuals_fused_padlanes_bf16,
    )
    from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights
    from phys_autodiff_tpu.utils.metrics import max_abs_err, rel_l2_err

    grids = [(96, 96, 64)] + ([] if args.skip64 else [(64, 64, 64)])
    w = PhysWeights()
    for nx, ny, nz in grids:
        g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        fs = harness.random_fields(g)
        flat = jax.block_until_ready(pack_fields_flat(g, fs))
        padded = jax.block_until_ready(pack_fields_pad(g, fs))

        # hardware parity first (also warms both compiles)
        out_pad = pad_to_grid(g, residuals_fused_padlanes(g, padded))
        out_flat = flat_to_grid(g, residuals_fused_flat(g, flat))
        rel = float(rel_l2_err(out_pad, out_flat))
        mx = float(max_abs_err(out_pad, out_flat))

        ms_flat = harness.time_packed_op(
            lambda p: residuals_fused_flat(g, p), flat
        )
        ms_pad = harness.time_packed_op(
            lambda p: residuals_fused_padlanes(g, p), padded
        )
        # fused loss forward (the padded arm masks junk lanes in-kernel)
        lf = jax.block_until_ready(loss_forward_fused_padlanes(g, w, padded))
        lff = jax.block_until_ready(loss_forward_fused_flat(g, w, flat))
        loss_rel = abs(float(lf[0]) - float(lff[0])) / abs(float(lff[0]))
        ms_loss_flat = harness.time_packed_op(
            lambda p: loss_forward_fused_flat(g, w, p)[0], flat
        )
        ms_loss_pad = harness.time_packed_op(
            lambda p: loss_forward_fused_padlanes(g, w, p)[0], padded
        )
        # bf16-I/O tier (1e-3 class): halo invariant carried in bf16
        flat16 = jax.block_until_ready(flat.astype(jnp.bfloat16))
        pad16 = jax.block_until_ready(padded.astype(jnp.bfloat16))
        ms_flat16 = harness.time_packed_op(
            lambda p: residuals_fused_flat_bf16(g, p), flat16
        )
        ms_pad16 = harness.time_packed_op(
            lambda p: residuals_fused_padlanes_bf16(g, p), pad16
        )
        print(
            json.dumps(
                {
                    "grid": f"{nx}x{ny}x{nz}",
                    "ms_flat": round(ms_flat, 5),
                    "ms_padlanes": round(ms_pad, 5),
                    "speedup": round(ms_flat / ms_pad, 3),
                    "ms_loss_flat": round(ms_loss_flat, 5),
                    "ms_loss_padlanes": round(ms_loss_pad, 5),
                    "ms_flat_bf16io": round(ms_flat16, 5),
                    "ms_padlanes_bf16io": round(ms_pad16, 5),
                    "parity_rel": rel,
                    "parity_max": mx,
                    "loss_rel": loss_rel,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
