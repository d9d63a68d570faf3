"""Benchmark harness reproducing the reference's measurement taxonomy.

The reference measures four scopes per (grid, variant) with warmup=2,
iters=10 (test/test_phys_perf.cpp:74-90, test/test_mlp_phys_perf.cpp:20-81,
docs/BENCHMARK_REPORT.md:15-24):

    ms_kernel     kernel-only (the residual-writing kernel)
    ms_phys_e2e   the physics portion as composed in the pipeline (for the
                  fused arm that is the in-kernel-reduction loss kernel; for
                  the staged arm, residuals -> loss_terms)
    ms_mlp        MLP field generation (3 time slices)
    ms_total      full pipeline per iteration

CSV schemas match the reference so reports are directly comparable:
    phys,residuals_nonfused|residuals_fused,nx,ny,nz,iters,ms
    mlp_phys,nonfused|fused,nx,ny,nz,iters,ms_kernel,ms_phys_e2e,ms_mlp,ms_total

Timing methodology (IMPORTANT — this was round 1's fatal flaw). The device
sits behind a tunnel whose dispatch/sync latency (~25 ms) dwarfs sub-ms
kernels, so everything is timed as an ON-DEVICE lax.fori_loop with a dynamic
trip count, a value fetch of a carried scalar in the timed region, and the
SLOPE between two trip counts (cancels constant dispatch+fetch overhead) —
the TPU analogue of CUDA-event timing (src/phys_cuda_nonfused.cu:322-345).

Round 1 consumed one element of one output, and XLA dead-code-eliminated
3/4 of the staged stencil (sliced fusions compute only their root's
elements). `jax.lax.optimization_barrier` is NOT a fix: this XLA build drops
the barrier during optimization and narrows anyway (verified on the CPU
backend: a barrier-protected sin(x) compiled to a 1-element fusion). The
harness therefore uses three *structurally* DCE-proof modes:

  * GENERATIONAL FEEDBACK (`time_residual_op`, for the XLA-staged residual
    op): the loop carries THREE generations of residual outputs and builds
    all six input fields from them (tm1 <- gen i-2, t <- gen i-1,
    tp1 <- gen i-3-equivalent). Because the outputs ARE the fori_loop carry,
    whose shapes are fixed, XLA must materialize every output at full shape
    every iteration — narrowing is impossible by construction, and nothing
    is loop-invariant. Traffic per iteration: 12 planes read + 4 written =
    64 B/cell, exactly the reference kernel's profile. Outputs are scaled by
    a carried runtime epsilon (fuses into the stencil epilogue, ~zero cost)
    so values decay instead of overflowing.
  * PROBE (`time_op`, for Pallas kernels and scalar pipelines): perturb one
    input element by the carry and fold one element of each output back in.
    Sound for Pallas because a pallas_call is an opaque custom call — XLA
    can neither narrow it nor split it; consuming any output element runs
    the whole kernel. Sound for scalar losses because the scalar depends on
    every cell.
  * REDUCE (`time_op(..., mode="reduce")`, for the staged field generator):
    fold jnp.sum of every output into the carry. Every element is computed;
    XLA may fuse the reduction and skip the output HBM writes, which for
    this compute-bound op skews the number by ~1-3% (documented, accepted).

`check_timed_hlo` compiles the exact timed loop and asserts the optimized
HLO retains full-shape ops for the outputs (feedback mode) or the opaque
custom call (probe mode) — the validity gate round-1 VERDICT demanded.
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


def _make_run(body: Callable):
    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, body, carry)

    return run


def time_loop(body: Callable, carry0, n_small=4, target_seconds=0.5, repeats=3):
    """ms per iteration of `body(i, carry) -> carry` via the slope method.

    carry0 must be a pytree whose FIRST leaf reduces to a fetchable scalar
    (we fetch leaf.reshape(-1)[0]); body must thread a data dependency
    through the carry (see module docstring).
    """
    run = _make_run(body)

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


def time_loop_static(body: Callable, carry0, n_small=4, n_big=132,
                     repeats=3):
    """ms/iter like `time_loop`, but the trip count is STATIC: the loop is
    a lax.scan of fixed length, jit-compiled once per trip count (exactly
    two compiles). Same soundness properties (on-device loop, loop-carried
    dependency, value fetch in the timed region, slope between two counts).

    Use for bodies containing FFT ops: a dynamic-trip-count fori_loop
    around rfftn/irfftn wedges the tunneled TPU worker's compiler
    (observed 2026-08-19 on the Euler step — the SAME body under a
    static-length scan compiles in seconds), and generally for any op
    XLA:TPU struggles to compile inside a while loop.
    """
    def make_run(n):
        @jax.jit
        def run(carry):
            def sbody(c, i):
                return body(i, c), None

            out, _ = jax.lax.scan(sbody, carry, jnp.arange(n))
            return out

        return run

    runs = {n: make_run(n) for n in (n_small, n_big)}

    def timed(n):
        t0 = time.perf_counter()
        out = runs[n](carry0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])  # force completion
        return time.perf_counter() - t0

    timed(n_small)
    timed(n_big)  # compile + warm both
    t_small = min(timed(n_small) for _ in range(repeats))
    t_big = min(timed(n_big) for _ in range(repeats))
    return (t_big - t_small) / (n_big - n_small) * 1e3


def _perturb(arr, acc):
    """Single-element nudge that makes the op depend on the loop carry; the
    dynamic-update-slice is in-place on the loop-carried buffer."""
    return arr.at[(0,) * arr.ndim].add((acc * 1e-30).astype(arr.dtype))


def _op_body(op_fn: Callable, mode: str):
    """Timing-loop body for `op_fn(x) -> pytree of outputs` (see module
    docstring for the mode soundness arguments)."""

    def body(i, carry):
        acc, x = carry
        # Carry the PERTURBED buffer forward: the one-element
        # dynamic-update-slice then aliases in place inside the while loop.
        # (Carrying the unperturbed x would keep both values live and force
        # a full copy of x every iteration — 56 MB/iter for packed fields.)
        x = _perturb(x, acc)
        outs = op_fn(x)
        s = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(outs):
            if mode == "reduce":
                s = s + jnp.sum(leaf).astype(jnp.float32)
            else:  # probe
                s = s + leaf.reshape(-1)[0].astype(jnp.float32)
        return acc + s * jnp.float32(1e-6), x

    return body


def time_op(op_fn: Callable, x, mode: str = "probe", **kw) -> float:
    """ms/iter of `op_fn(x) -> pytree`. mode: "probe" (Pallas/opaque ops and
    scalar pipelines) or "reduce" (XLA ops whose full output must be forced;
    see module docstring)."""
    return time_loop(_op_body(op_fn, mode), (jnp.float32(0.0), x), **kw)


# ---------------------------------------------------------------------------
# Generational-feedback residual timing (structurally DCE-proof)
# ---------------------------------------------------------------------------


def _residual_feedback_body(res_fn):
    """Loop body: all six input fields are built from the three most recent
    output generations, so every output is a full-shape carry element."""

    def body(i, carry):
        rs_a, ru_a, rs_b, ru_b, rs_c, ru_c, eps = carry
        fields = FieldSnapshots(
            sigma_tm1=rs_c, sigma_t=rs_a, sigma_tp1=rs_b,
            u_tm1=ru_c, u_t=ru_a, u_tp1=ru_b,
        )
        rs, ru = res_fn(fields)
        # Damp with the carried runtime scalar (cannot be constant-folded);
        # fuses into the stencil epilogue.
        return rs * eps, ru * eps, rs_a, ru_a, rs_b, ru_b, eps

    return body


def _residual_feedback_carry(fields: FieldSnapshots):
    # The FIRST leaf is the newest output generation: time_loop fetches
    # leaf 0 as its completion fence, so it must be data-dependent on the
    # whole loop (the loop-invariant eps scalar goes last — as leaf 0 it
    # could in principle unblock before the loop finishes on a runtime
    # with per-buffer readiness).
    return (
        fields.sigma_t, fields.u_t,
        fields.sigma_tp1, fields.u_tp1,
        fields.sigma_tm1, fields.u_tm1,
        jnp.float32(1e-3),
    )


def time_residual_op(res_fn, fields: FieldSnapshots) -> float:
    """ms/iter of a residuals(fields) -> (r_sigma, r_u) op, generational
    feedback mode: 12 planes read + 4 written per iteration, exactly the
    reference kernel's traffic, with materialization forced by the carry.
    Use for XLA-staged ops; Pallas ops take time_residual_probe (the eps
    damping here costs an extra un-fusable pass on an opaque kernel)."""
    return time_loop(
        _residual_feedback_body(res_fn), _residual_feedback_carry(fields)
    )


def time_residual_probe(res_fn, fields: FieldSnapshots) -> float:
    """ms/iter of a Pallas residuals op, probe mode (sound: opaque custom
    calls execute whole or not at all; one varying operand prevents
    hoisting)."""
    return time_op(lambda s: res_fn(fields._replace(sigma_t=s)), fields.sigma_t)


def time_packed_op(op_fn, packed) -> float:
    """ms/iter of an op over the packed [12, nz, ny, nx] layout (probe mode —
    packed ops are Pallas kernels)."""
    return time_op(op_fn, packed)


def check_timed_hlo(
    op_fn: Callable,
    x,
    required: list[str],
    mode: str = "probe",
    fields: FieldSnapshots | None = None,
) -> str:
    """Compile the exact timed loop and assert the optimized HLO retains the
    required signatures (full shapes for feedback mode, the opaque custom
    call for Pallas probe mode). Returns the HLO text.

    Feedback mode asserts each required SHAPE appears as the result type of
    a COMPUTE op (fusion/arithmetic), not merely anywhere in the text — the
    carry shapes always appear in the while-loop parameter signature, so a
    plain substring match would be vacuously true even with the body
    narrowed away."""
    import re

    if mode == "feedback":
        run = _make_run(_residual_feedback_body(op_fn))
        args = (_residual_feedback_carry(fields), jnp.int32(4))
    else:
        run = _make_run(_op_body(op_fn, mode))
        args = ((jnp.float32(0.0), x), jnp.int32(4))
    txt = run.lower(*args).compile().as_text()
    for sig in required:
        is_shape = re.fullmatch(r"\w+\[[\d,]+\]", sig) is not None
        if mode == "feedback" and is_shape:
            pat = re.compile(
                r"= " + re.escape(sig)
                + r"\S*\s+(fusion|add|multiply|subtract|divide|concatenate)\("
            )
            assert pat.search(txt), (
                f"timed HLO has no compute op producing {sig!r} — DCE?"
            )
        else:
            assert sig in txt, (
                f"timed HLO lost required signature {sig!r} — DCE?"
            )
    return txt


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


def time_fieldgen(gen_fn, params, mode: str = "probe") -> float:
    """ms/iter of a generate_fields(params) -> FieldSnapshots (or packed) op.
    Use mode="reduce" for XLA-staged generators (probe would narrow them);
    "probe" is sound for the fused Pallas generators."""

    def op(w1):
        p = dict(params)
        p["W1"] = w1
        return gen_fn(p)

    return time_op(op, params["W1"], mode=mode)


def time_scalar_pipeline(loss_fn, params) -> float:
    """ms/iter of a loss(params) -> scalar(s) pipeline (probe mode is sound:
    the scalar depends on every cell)."""

    def op(w1):
        p = dict(params)
        p["W1"] = w1
        return loss_fn(p)

    return time_op(op, params["W1"])


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
    """Physics residuals only, staged vs fused (port of test_phys_perf).

    The fused row is the packed kernel — the variant that actually sits in
    the fast pipeline (round-1 ADVICE: name the arm being measured). The
    FieldSnapshots-layout multi-stream kernel gets its own row.
    """
    from phys_autodiff_tpu.pallas import residuals_fused
    from phys_autodiff_tpu.pallas.residuals import (
        flat_rows,
        pack_fields,
        pack_fields_flat,
        pack_fields_pad,
        padded_px,
        residuals_fused_flat,
        residuals_fused_flat_bf16,
        residuals_fused_packed,
        residuals_fused_packed_bf16,
        residuals_fused_packed_mixed_out,
        residuals_fused_padlanes,
    )

    fs = random_fields(g)
    ms_staged = time_residual_op(lambda x: ops.residuals(g, x), fs)
    ms_multi = time_residual_probe(lambda x: residuals_fused(g, x), fs)
    rows = [PhysRow("nonfused", g.nx, g.ny, g.nz, iters, ms_staged)]
    if g.nx % 128 == 0:
        # packed one-DMA kernel (the flagship) + its bf16-I/O variant
        packed = jax.block_until_ready(pack_fields(fs))
        packed_bf16 = jax.block_until_ready(packed.astype(jnp.bfloat16))
        ms_packed = time_packed_op(lambda p: residuals_fused_packed(g, p), packed)
        ms_bf16 = time_packed_op(
            lambda p: residuals_fused_packed_bf16(g, p), packed_bf16
        )
        ms_mixed = time_packed_op(
            lambda p: residuals_fused_packed_mixed_out(g, p), packed
        )
        rows += [
            PhysRow("fused", g.nx, g.ny, g.nz, iters, ms_packed),
            PhysRow("fused_multistream", g.nx, g.ny, g.nz, iters, ms_multi),
            # mixed-precision arms, labeled separately (the headline JSON
            # only considers f32 arms): bf16 I/O, and f32-in/bf16-out
            # (56 B/cell — round-2 VERDICT #4's traffic-trim experiment).
            PhysRow("fused_bf16io", g.nx, g.ny, g.nz, iters, ms_bf16),
            PhysRow("fused_f32in_bf16out", g.nx, g.ny, g.nz, iters, ms_mixed),
        ]
    elif flat_rows(g) is not None:
        # unaligned nx: the fused arm is the FLAT-layout one-DMA kernel
        # (planes as [ny*nx/128, 128] lane rows — the reference's own flat
        # x-fastest layout); the per-plane kernel gets its own row.
        flat = jax.block_until_ready(pack_fields_flat(g, fs))
        flat_bf16 = jax.block_until_ready(flat.astype(jnp.bfloat16))
        ms_flat = time_packed_op(lambda p: residuals_fused_flat(g, p), flat)
        ms_flat_bf16 = time_packed_op(
            lambda p: residuals_fused_flat_bf16(g, p), flat_bf16
        )
        rows += [
            PhysRow("fused", g.nx, g.ny, g.nz, iters, ms_flat),
            PhysRow("fused_plane", g.nx, g.ny, g.nz, iters, ms_multi),
            PhysRow("fused_bf16io", g.nx, g.ny, g.nz, iters, ms_flat_bf16),
        ]
        px = padded_px(g)
        if px is not None and px - g.nx <= g.nx // 2:
            # round-5 halo-padded-lane arm: pad ratio <= 1.5 is the measured
            # win region (96x96x64: 28.5 us vs flat 39.5; at nx=64 the 2x
            # pad loses — see DESIGN.md "unaligned-nx" matrix). Timed on its
            # native pre-padded layout like every packed-family arm.
            padded = jax.block_until_ready(pack_fields_pad(g, fs))
            ms_pad = time_packed_op(
                lambda p: residuals_fused_padlanes(g, p), padded
            )
            rows.append(
                PhysRow(f"fused_pad{px}", g.nx, g.ny, g.nz, iters, ms_pad)
            )
    else:
        # ny*nx % 128 != 0: only the per-plane Pallas kernel applies.
        rows.append(PhysRow("fused", g.nx, g.ny, g.nz, iters, ms_multi))
    return rows


def bench_pipeline(g: GridSpec, h=128, iters=DEFAULT_ITERS, seed=777) -> list:
    """Full MLP+physics pipeline, staged vs fused (port of
    test_mlp_phys_perf: H=128, seed 777, 3 grid evals per physics step).

    Per-row scope consistency: every column of a row measures the kernel
    family used by that row's ms_total pipeline —
      nonfused    ms_kernel=staged residuals, ms_phys_e2e=staged residuals->
                  loss, ms_mlp=staged fieldgen, ms_total=staged loss
      fused(_bf16) ms_kernel=packed residual kernel, ms_phys_e2e=packed
                  in-kernel-reduction loss kernel, ms_mlp=packed fused
                  fieldgen, ms_total=packed fused loss pipeline

    The fused_bf16 row shares ms_kernel/ms_phys_e2e with the fused row BY
    DESIGN: the bf16 pipeline tier runs bf16 only inside the MLP fieldgen
    (its physics kernels are the same f32 packed/flat kernels that its own
    ms_total uses), so identical physics columns are the honest report.
    The separately-labeled bf16-I/O residual kernel is a bench_phys arm,
    not part of any pipeline.
    """
    from phys_autodiff_tpu.pallas.mlp import (
        fused_loss_pipeline,
        generate_fields_fused_flat,
        generate_fields_fused_packed,
    )
    from phys_autodiff_tpu.pallas.residuals import (
        flat_rows,
        loss_forward_fused_flat,
        loss_forward_fused_packed,
        pack_fields,
        pack_fields_flat,
        residuals_fused_flat,
        residuals_fused_packed,
    )

    cfg = MLPGridConfig(dims=MLPDims(H=h))
    params = mlp.init_params(cfg.dims, seed=seed)
    w = PhysWeights()
    fs = random_fields(g)

    ms_staged_res = time_residual_op(lambda x: ops.residuals(g, x), fs)
    # Physics-as-composed scopes: both end in a scalar, probe mode is sound.
    ms_staged_phys = time_op(
        lambda s: ops.loss_terms(g, w, *ops.residuals(g, fs._replace(sigma_t=s))),
        fs.sigma_t,
    )

    if g.nx % 128 != 0 and flat_rows(g) is None:
        # ny*nx % 128 != 0: no one-DMA kernel applies, so only the staged
        # row and a per-plane-kernel fused row are honest at this shape.
        from phys_autodiff_tpu.pallas import loss_forward_fused, residuals_fused

        ms_plane = time_residual_probe(lambda x: residuals_fused(g, x), fs)
        ms_plane_loss = time_op(
            lambda s: loss_forward_fused(g, w, fs._replace(sigma_t=s)),
            fs.sigma_t,
        )

        def staged_total(p):
            f2 = fields_mod.generate_fields(g, cfg, p, 0.25, g.dt)
            rs, ru = ops.residuals(g, f2)
            ls, lu = ops.loss_terms(g, w, rs, ru)
            return ls + lu

        def plane_total(p):
            f2 = fields_mod.generate_fields(g, cfg, p, 0.25, g.dt)
            ls, lu = loss_forward_fused(g, w, f2)
            return ls + lu

        gen_fn = lambda p: fields_mod.generate_fields(g, cfg, p, 0.25, g.dt)
        ms_mlp = time_fieldgen(gen_fn, params, mode="reduce")
        rows = [
            PipelineRow(
                "nonfused", g.nx, g.ny, g.nz, iters,
                ms_kernel=ms_staged_res, ms_phys_e2e=ms_staged_phys,
                ms_mlp=ms_mlp,
                ms_total=time_scalar_pipeline(staged_total, params),
            ),
            PipelineRow(
                "fused_plane", g.nx, g.ny, g.nz, iters,
                ms_kernel=ms_plane, ms_phys_e2e=ms_plane_loss,
                ms_mlp=ms_mlp,
                ms_total=time_scalar_pipeline(plane_total, params),
            ),
        ]
        # the mega kernel runs at unaligned nx via lane padding
        from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline

        for variant, prec in (("mega", "f32"), ("mega_bf16", "bf16")):

            def mega_total(p, prec=prec):
                ls, lu = mega_loss_pipeline(g, w, cfg, p, 0.25, prec)
                return ls + lu

            ms = time_scalar_pipeline(mega_total, params)
            rows.append(
                PipelineRow(
                    variant, g.nx, g.ny, g.nz, iters,
                    ms_kernel=ms, ms_phys_e2e=ms, ms_mlp=ms, ms_total=ms,
                )
            )
        return rows

    # One-DMA fused arms: packed layout on 128-aligned nx, flat otherwise.
    if g.nx % 128 == 0:
        packed = jax.block_until_ready(pack_fields(fs))
        ms_packed_res = time_packed_op(lambda p: residuals_fused_packed(g, p), packed)
        ms_packed_loss = time_packed_op(
            lambda p: loss_forward_fused_packed(g, w, p), packed
        )
        gen_fused = generate_fields_fused_packed
    else:
        flat = jax.block_until_ready(pack_fields_flat(g, fs))
        ms_packed_res = time_packed_op(lambda p: residuals_fused_flat(g, p), flat)
        ms_packed_loss = time_packed_op(
            lambda p: loss_forward_fused_flat(g, w, p), flat
        )
        gen_fused = generate_fields_fused_flat

    rows = []
    for variant in ("nonfused", "fused", "fused_bf16"):
        if variant == "nonfused":
            gen_fn = lambda p: fields_mod.generate_fields(g, cfg, p, 0.25, g.dt)
            gen_mode = "reduce"

            def total(p):
                f2 = fields_mod.generate_fields(g, cfg, p, 0.25, g.dt)
                rs, ru = ops.residuals(g, f2)
                ls, lu = ops.loss_terms(g, w, rs, ru)
                return ls + lu

            ms_kernel, ms_phys = ms_staged_res, ms_staged_phys
        else:
            prec = "bf16" if variant == "fused_bf16" else "f32"
            gen_fn = lambda p, prec=prec: gen_fused(g, cfg, p, 0.25, prec)
            gen_mode = "probe"

            def total(p, prec=prec):
                ls, lu = fused_loss_pipeline(g, w, cfg, p, 0.25, prec)
                return ls + lu

            ms_kernel, ms_phys = ms_packed_res, ms_packed_loss

        ms_mlp = time_fieldgen(gen_fn, params, mode=gen_mode)
        ms_total = time_scalar_pipeline(total, params)
        rows.append(
            PipelineRow(
                variant, g.nx, g.ny, g.nz, iters,
                ms_kernel=ms_kernel, ms_phys_e2e=ms_phys,
                ms_mlp=ms_mlp, ms_total=ms_total,
            )
        )

    # The MLP->residual->loss MEGA-kernel (the reference's declared next
    # step): ONE kernel is the whole pipeline, so all four scopes coincide.
    from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline

    for variant, prec in (("mega", "f32"), ("mega_bf16", "bf16")):

        def total(p, prec=prec):
            ls, lu = mega_loss_pipeline(g, w, cfg, p, 0.25, prec)
            return ls + lu

        ms = time_scalar_pipeline(total, params)
        rows.append(
            PipelineRow(
                variant, g.nx, g.ny, g.nz, iters,
                ms_kernel=ms, ms_phys_e2e=ms, ms_mlp=ms, ms_total=ms,
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
