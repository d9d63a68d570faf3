"""A/B timing for the NGP mega-kernel's stage-3 head-backward variants.

Round-3 ablation context (docs/DESIGN.md "NGP one-kernel training"): the
f32 NGP step spends ~6 ms in the stage-3 head backward, and the per-row
work there is ~15 [h, M]-element VPU passes — VMEM-traffic-bound, not
FLOP-bound. pallas/mega_ngp.py now carries two algebraically-identical
formulations selected by `_HEAD_VARIANT`:

  base    z1f materialized, relu'd twice (mask + dW2 operand), dz1 summed
          across the 3 time slices, one K=M dW1 dot + one K=H dEnc dot.
  fused   a1 = relu(base + tb1) once (mask comes from a1 > 0), dz1_sum
          deleted: dW1/dEnc accumulate per slice via K=M / K=H dots —
          ~2 fewer [h, M] element passes per slice for 2 extra MXU dots.
  fused2  one-expression ReLU like "fused" but dz1_sum and the single
          post-loop dW1/dEnc dots kept like "base" — strictly fewer
          passes than base, no extra dots.

This script slope-times the full NGP train step (the same
bench_ngp_train_step the benchmark uses) under each variant x precision on
the current backend and prints ms/step, so "auto" can resolve to measured
fact. Run on hardware from the repo root:

    PYTHONPATH=.:$PYTHONPATH python scripts/ngp_head_experiments.py
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phys_autodiff_tpu.bench.trainbench import bench_ngp_train_step
from phys_autodiff_tpu.pallas import mega_ngp
from phys_autodiff_tpu.utils.config import GridSpec


def main(nx=128, ny=96, nz=96):
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    print(f"# grid {nx}x{ny}x{nz}, backend={jax.default_backend()}")
    print("# variant,precision,ms_step")
    for variant in ("base", "fused", "fused2"):
        mega_ngp._HEAD_VARIANT = variant
        for precision in ("f32", "bf16"):
            ms = bench_ngp_train_step(g, precision=precision, backward="mega")
            print(f"{variant},{precision},{ms:.5f}", flush=True)
    mega_ngp._HEAD_VARIANT = "auto"


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/ngp_head_experiments.py")
    if len(sys.argv) not in (1, 4):
        sys.exit("usage: python scripts/ngp_head_experiments.py [nx ny nz]")
    dims = [int(a) for a in sys.argv[1:4]]
    main(*dims) if dims else main()
