"""Benchmark harness reproducing the reference's measurement taxonomy.

The reference measures four scopes per (grid, variant) with warmup=2,
iters=10 (test/test_phys_perf.cpp:74-90, test/test_mlp_phys_perf.cpp:20-81,
docs/BENCHMARK_REPORT.md:15-24):

    ms_kernel     kernel-only
    ms_phys_e2e   physics op end-to-end (the reference includes per-call
                  device alloc + H2D/D2H; this framework keeps arrays
                  device-resident by design, so E2E == kernel here)
    ms_mlp        MLP field generation (3 time slices)
    ms_total      full pipeline per iteration

CSV schemas match the reference so reports are directly comparable:
    phys,residuals_nonfused|residuals_fused,nx,ny,nz,iters,ms
    mlp_phys,nonfused|fused,nx,ny,nz,iters,ms_kernel,ms_phys_e2e,ms_mlp,ms_total

"nonfused" = the XLA-staged arm, "fused" = the Pallas kernels — the same
staged-vs-fused comparison the reference makes.

Timing methodology (IMPORTANT): on this hardware the device is reached
through a tunnel whose dispatch/sync latency (~25 ms) dwarfs sub-ms kernels,
and block_until_ready can return before device completion. Honest numbers
therefore come from:
  1. an ON-DEVICE lax.fori_loop with a dynamic trip count (one compile),
  2. a loop-carried data dependency threaded through one input element so
     the compiler cannot hoist the loop-invariant op out of the loop,
  3. a VALUE FETCH of the carried scalar inside the timed region, and
  4. the SLOPE between two trip counts, which cancels the constant
     dispatch+fetch+transfer overhead.
This is the TPU analogue of the reference's CUDA-event kernel timing
(src/phys_cuda_nonfused.cu:322-345).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import fields as fields_mod
from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.ops.stencil import FieldSnapshots
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

# The reference's benchmark grids (test/test_phys_perf.cpp:74-90).
REFERENCE_GRIDS = [(64, 64, 64), (96, 96, 64), (128, 96, 96)]
DEFAULT_ITERS = 10


def time_loop(body: Callable, carry0, n_small=4, target_seconds=0.5, repeats=3):
    """ms per iteration of `body(i, carry) -> carry` via the slope method.

    carry0 must be a pytree whose FIRST leaf reduces to a fetchable scalar
    (we fetch leaf.reshape(-1)[0]); body must thread a data dependency
    through the carry (see module docstring).
    """

    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, body, carry)

    def timed(n):
        t0 = time.perf_counter()
        out = run(carry0, n)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])  # force completion
        return time.perf_counter() - t0

    timed(n_small)  # compile + warm
    t_small = min(timed(n_small) for _ in range(repeats))
    # estimate per-iter to size the big run
    n_probe = n_small + 64
    t_probe = min(timed(n_probe) for _ in range(repeats))
    est = max((t_probe - t_small) / 64, 1e-6)
    n_big = n_small + max(64, int(target_seconds / est))
    n_big = min(n_big, 200_000)
    t_big = min(timed(n_big) for _ in range(repeats))
    return (t_big - t_small) / (n_big - n_small) * 1e3


def _perturb(arr, acc):
    """Single-element nudge that makes the op depend on the loop carry; the
    dynamic-update-slice is in-place on the loop-carried buffer."""
    return arr.at[(0,) * arr.ndim].add(acc * 1e-30)


def random_fields(g: GridSpec, seed=0) -> FieldSnapshots:
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return FieldSnapshots(
        sigma_tm1=mk(g.shape),
        sigma_t=mk(g.shape),
        sigma_tp1=mk(g.shape),
        u_tm1=mk((3,) + g.shape),
        u_t=mk((3,) + g.shape),
        u_tp1=mk((3,) + g.shape),
    )


def time_residual_op(res_fn, fields: FieldSnapshots) -> float:
    """ms/iter of a residuals(fields) -> (r_sigma, r_u) op."""

    def body(i, carry):
        acc, sigma_t = carry
        fs = fields._replace(sigma_t=_perturb(sigma_t, acc))
        rs, _ = res_fn(fs)
        return rs.reshape(-1)[0], fs.sigma_t

    return time_loop(body, (jnp.float32(0.0), fields.sigma_t))


def time_fieldgen(gen_fn, params) -> float:
    """ms/iter of a generate_fields(params) -> FieldSnapshots op."""

    def body(i, carry):
        acc, w1 = carry
        p = dict(params)
        p["W1"] = _perturb(w1, acc)
        fs = gen_fn(p)
        return fs.sigma_t.reshape(-1)[0], p["W1"]

    return time_loop(body, (jnp.float32(0.0), params["W1"]))


def time_scalar_pipeline(loss_fn, params) -> float:
    """ms/iter of a loss(params) -> scalar pipeline."""

    def body(i, carry):
        acc, w1 = carry
        p = dict(params)
        p["W1"] = _perturb(w1, acc)
        loss = loss_fn(p)
        return loss, p["W1"]

    return time_loop(body, (jnp.float32(0.0), params["W1"]))


@dataclasses.dataclass
class PhysRow:
    variant: str
    nx: int
    ny: int
    nz: int
    iters: int
    ms: float

    def csv(self) -> str:
        return f"phys,residuals_{self.variant},{self.nx},{self.ny},{self.nz},{self.iters},{self.ms:.5f}"


@dataclasses.dataclass
class PipelineRow:
    variant: str
    nx: int
    ny: int
    nz: int
    iters: int
    ms_kernel: float
    ms_phys_e2e: float
    ms_mlp: float
    ms_total: float

    def csv(self) -> str:
        return (
            f"mlp_phys,{self.variant},{self.nx},{self.ny},{self.nz},{self.iters},"
            f"{self.ms_kernel:.5f},{self.ms_phys_e2e:.5f},{self.ms_mlp:.5f},"
            f"{self.ms_total:.5f}"
        )


def bench_phys(g: GridSpec, iters=DEFAULT_ITERS) -> list:
    """Physics residuals only, staged vs fused (port of test_phys_perf)."""
    from phys_autodiff_tpu.pallas import residuals_fused

    fs = random_fields(g)
    ms_staged = time_residual_op(lambda x: ops.residuals(g, x), fs)
    ms_fused = time_residual_op(lambda x: residuals_fused(g, x), fs)
    return [
        PhysRow("nonfused", g.nx, g.ny, g.nz, iters, ms_staged),
        PhysRow("fused", g.nx, g.ny, g.nz, iters, ms_fused),
    ]


def bench_pipeline(g: GridSpec, h=128, iters=DEFAULT_ITERS, seed=777) -> list:
    """Full MLP+physics pipeline, staged vs fused (port of
    test_mlp_phys_perf: H=128, seed 777, 3 grid evals per physics step)."""
    from phys_autodiff_tpu.pallas import residuals_fused
    from phys_autodiff_tpu.pallas.mlp import generate_fields_fused

    cfg = MLPGridConfig(dims=MLPDims(H=h))
    params = mlp.init_params(cfg.dims, seed=seed)
    w = PhysWeights()
    fs = random_fields(g)

    staged_res = lambda x: ops.residuals(g, x)
    fused_res = lambda x: residuals_fused(g, x)
    ms_phys = {
        "nonfused": time_residual_op(staged_res, fs),
        "fused": time_residual_op(fused_res, fs),
    }
    ms_phys["fused_bf16"] = ms_phys["fused"]  # same residual kernel

    gens = {
        "nonfused": lambda p: fields_mod.generate_fields(g, cfg, p, 0.25, g.dt),
        "fused": lambda p: generate_fields_fused(g, cfg, p, 0.25),
        # REQUIREMENT.md:124-130's mixed-precision milestone: bf16 MXU inputs
        # with f32 accumulation (tolerance class 1e-3).
        "fused_bf16": lambda p: generate_fields_fused(g, cfg, p, 0.25, "bf16"),
    }
    from phys_autodiff_tpu.pallas.mlp import fused_loss_pipeline

    rows = []
    for variant, gen_fn in gens.items():
        res_fn = staged_res if variant == "nonfused" else fused_res

        if variant == "nonfused":

            def total(p, res_fn=res_fn, gen_fn=gen_fn):
                f2 = gen_fn(p)
                rs, ru = res_fn(f2)
                ls, lu = ops.loss_terms(g, w, rs, ru)
                return ls + lu

        else:
            prec = "bf16" if variant == "fused_bf16" else "f32"

            def total(p, prec=prec):
                ls, lu = fused_loss_pipeline(g, w, cfg, p, 0.25, prec)
                return ls + lu

        ms_mlp = time_fieldgen(gen_fn, params)
        ms_total = time_scalar_pipeline(total, params)
        rows.append(
            PipelineRow(
                variant, g.nx, g.ny, g.nz, iters,
                ms_kernel=ms_phys[variant], ms_phys_e2e=ms_phys[variant],
                ms_mlp=ms_mlp, ms_total=ms_total,
            )
        )
    return rows


def run_all(iters=DEFAULT_ITERS, grids=None, h=128, pipeline_grids=None):
    """Full suite; returns (phys_rows, pipeline_rows)."""
    grids = grids or REFERENCE_GRIDS
    pipeline_grids = pipeline_grids or grids
    phys_rows, pipe_rows = [], []
    for nx, ny, nz in grids:
        g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        phys_rows += bench_phys(g)
    for nx, ny, nz in pipeline_grids:
        g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        pipe_rows += bench_pipeline(g, h=h)
    return phys_rows, pipe_rows
