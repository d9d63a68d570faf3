"""The NGP backward mega-kernel: loss AND all head/encoder-cotangent
gradients in one pass.

Round-3 profiling pinned the NGP train step's cost on the XLA-level decode
head, not the encoder: with dense levels the encoder runs 0.95 ms fwd and
its backward is a free transposed matmul, while the head chain costs
~8.5 ms of the 10.3 ms step — the [N, H] hidden activations are ~300 MB a
pass at the flagship grid and XLA materializes them through HBM in both
directions, plus MXU-hostile K=16 / K=4 contractions. That is exactly the
disease pallas/mega_bwd.py cured for the coordinate MLP, so this kernel is
its NGP twin: the same 3-stage rolling pipeline (field window -> residual
cotangents -> hand-derived stencil adjoint, REUSED from mega_bwd's
_PlaneOps), with stages 1/4 swapped from the rank-1 AB/CD tables to the
hash-encoding head:

  stage 1 (field row L = i-2): base[h] = sum_c W1[c,h]*enc[c] (the
          time-independent layer-1 term; time enters as the rank-1 row
          t*W1[-1] — models/ngp.py _head_base), three ReLU head slices
          into the 5-row field window; enc rows arrive by BlockSpec from
          the [nz, LF, ny, nx] encoding, base/enc rows are carried in
          3-slot VMEM windows for stage 3.
  stage 2 (residual row r = i-3): shared _PlaneOps.stage2_residuals ->
          per-plane loss partials + scaled cotangents.
  stage 3 (gradient row d = i-4): shared _PlaneOps.stage3_adjoint -> field
          cotangents gy; then the head backward entirely in VMEM:
          da1 (4 VPU FMAs or K=4 dot), dz1 = relu-mask, accumulators for
          dW2/db2/dW1/db1/d(t-row), and dEnc[c] = sum_h W1[c,h]*dz1sum —
          written back per row as the kernel's one grid-sized output
          (16 B/cell, the encoder adjoint's input).

Outside the kernel the encoder pulls dEnc back to the hash/dense tables
through jax.vjp of the channel-first regular-grid encoder (transposed
static resampling matmuls — no scatter; hash_encoder.encode_grid_zcf).

HBM traffic per step: enc read (LF planes) + dEnc write + parameter-sized
accumulators — ~150 MB total at the flagship grid vs the ~GB-class XLA
activation traffic it replaces.

No reference analogue (the reference has no hash encoding and never built
training); the NGP extension itself is framed by the project north star.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu.models import ngp as ngp_mod
from phys_autodiff_tpu.models.encoders import (
    encode_grid_zcf,
    encode_grid_zcf_rows,
)
from phys_autodiff_tpu.ops import loss as ops_loss
from phys_autodiff_tpu.pallas.mega_bwd import (
    _PlaneOps,
    mega_flat,
    mega_supported,
)
from phys_autodiff_tpu.pallas.residuals import flat_rows
from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


# NGP-kernel contraction modes (round-4 re-ablation). The coordinate-MLP
# backward kernel's measured optimum (all-VPU for f32, pallas/mega_bwd.py)
# does NOT transfer to this kernel's shapes: the NGP head is h=64 with an
# LF=16 base contraction, where the VPU forms pay per-channel sweep chains
# that the MXU amortizes even at HIGHEST precision. Hardware A/B at the
# flagship grid (kernel-only ms, f32, 2026-08-20; cells in ROUND4.md):
#   all-vpu (r03 default)                  8.28
#   fwd=dot                               7.80
#   fwd=dot + da1=dot                     8.13   (da1 stays VPU: K=4 dot loses)
#   fwd=dot + da1=dot + dw2=dot           7.58
#   fwd=dot + da1=vpu + dw2=dot           6.72
#   + head_variant=fused2                 6.67   (the shipped default)
# Numerical class is unchanged: the dots run Precision.HIGHEST like the
# staged arm's own head matmuls (measured 1.4e-5 global-rel vs the VPU
# chains — well inside the f32 tier's 8e-4 hardware-parity budget).
_NGP_FWD_MODE = "auto"
_NGP_DA1_MODE = "auto"
_NGP_DW2_MODE = "auto"


def _resolve_ngp_mode(which: str, precision) -> str:
    forced = {
        "fwd": _NGP_FWD_MODE, "da1": _NGP_DA1_MODE, "dw2": _NGP_DW2_MODE,
    }[which]
    if forced != "auto":
        return forced
    if precision in ("f32", "f32_high", "f32_fastbwd"):
        return "vpu" if which == "da1" else "dot"
    return "dot"


# Stage-3 head-backward form. The round-3 ablation measured the f32 head
# backward VMEM-traffic-bound (~6 ms of ~15 [h, M] element passes per row);
# three algebraically-identical formulations, A/B'd on hardware by
# scripts/ngp_head_experiments.py:
#   base    z1f materialized, relu'd twice (mask + dW2 operand), dz1 summed
#           across the 3 time slices, ONE K=M dW1 dot + ONE K=H dEnc dot.
#   fused   one-expression ReLU (a1 = relu(base + tb1_s) doubles as mask
#           source and dW2 operand — a1 > 0 iff z1 > 0, ties give 0 either
#           way) AND dz1_sum deleted: dW1/dEnc accumulate per slice via
#           K=M / K=H dots — 2 fewer [h, M] passes per slice for 4 extra
#           MXU dots per row.
#   fused2  the strict-win subset: one-expression ReLU (saves the z1f pass
#           + second relu) but KEEPS the dz1_sum chain and the single
#           post-loop dW1/dEnc dots — fewer passes than "base", no extra
#           dots. (f32 summation order matches "base" exactly.)
# Hardware A/B (128x96x96, ms/step, 2026-08-18, build/captures/
# ngp_head_ab.csv): f32 base 10.274 / fused 11.228 / fused2 10.310;
# bf16 base 5.540 / fused 5.895 / fused2 5.560. The per-slice dot tax in
# "fused" costs ~0.9 ms f32 — more than the passes it saves; "fused2"'s
# saved z1f pass was below measurement noise under r03's all-VPU modes.
# Round-4 re-measure under the dot modes (_resolve_ngp_mode above):
# fused2 6.67 vs base 6.72 kernel-only — "auto" now resolves to fused2
# (same f32 summation order as base, so parity surfaces are unchanged).
_HEAD_VARIANT = "auto"


def _resolve_head_variant() -> str:
    return "fused2" if _HEAD_VARIANT == "auto" else _HEAD_VARIANT


# Round-5 experiment — MEASURED, closed (round-4 VERDICT #4): the one
# untried lever on the f32 tier's [h, M] element-pass floor was cutting the
# OPERAND width of the carried windows. The base/enc rows are written in
# stage 1 and re-read two programs later in stage 3; storing those two
# scratch windows in bf16 halves their VMEM write+read traffic while every
# dot still accumulates f32. Hardware A/B (flagship 128x96x96 train step,
# 2026-08-20):
#
#     f32 tier, f32 windows      8.700 ms    grads 1.2e-5 vs jax.grad
#     f32 tier, bf16 windows     6.067 ms    grads 2.3e-2 (loss stays
#                                            1.8e-6 — forward untouched)
#     bf16 tier (reference pt)   5.267 ms    grads 4.5e-2, loss 1.5e-1
#
# Verdict: the lever moves the floor (-30%, and 6.07 <= the 1.5x-vs-staged
# target of 7.5 ms) but necessarily leaves the f32 gradient class — the
# bf16 rounding of the carried base flips ReLU masks and rounds every
# backward operand. The F32 TIER therefore keeps exact windows and its
# ~8.7 ms floor stands FINAL. The measured point is NOT dominated by the
# bf16 tier though (f32-exact loss, 2x tighter gradients), so it ships as
# the opt-in "f32_fastbwd" tier: exact f32 forward/loss, reduced-precision
# backward windows, ~2.3e-2 gradient class at near-bf16-tier speed.
# (_F32_WIN_DTYPE forces the window dtype for the plain f32 tiers — the
# experiment switch that produced the table; "auto" = exact.)
_F32_WIN_DTYPE = "auto"  # "auto" | "f32" | "bf16"


def _resolve_f32_win() -> str:
    return "f32" if _F32_WIN_DTYPE == "auto" else _F32_WIN_DTYPE


def ngp_supported(g: GridSpec) -> bool:
    """Same plane-alignment eligibility as the coordinate-MLP backward
    mega-kernel (the stencil stages are literally shared)."""
    return mega_supported(g)


def _build_ngp_bwd_call(
    g: GridSpec, lf: int, h: int, w: PhysWeights, precision, interpret,
    nz_local: int | None = None, need_denc: bool = True,
):
    """nz_local < nz builds the SHARD-LOCAL kernel (mirrors mega_bwd's):
    it covers global rows [z0, z0 + nz_local), z0 arriving as a runtime
    SMEM scalar. In that mode the encoding arrives PRE-EXTENDED: the caller
    gathers rows (z0 - 2 .. z0 + nz_local + 1, wrapped/clamped) into an
    [nz_local + 4, LF, pny, pnx] block so the enc index map stays a static
    function of the program id (index maps cannot read runtime scalars);
    clamp edge corrections key on GLOBAL rows via z0.

    need_denc=False drops the dEnc output entirely — the kernel's one
    grid-sized write (LF*4 B/cell, ~184 MB at the flagship for LF=39) and
    its per-row K=H dot. Parameter-free encodings (Fourier) pull dEnc back
    to an EMPTY gradient, so for them the cotangent is pure waste."""
    ops = _PlaneOps(g, w)
    nz = g.nz
    pny, pnx = ops.pny, ops.pnx
    m = pny * pnx
    ext_mode = nz_local is not None
    if nz_local is None:
        nz_local = nz
    n_prog = nz_local + 4
    da1_mode = _resolve_ngp_mode("da1", precision)
    dw2_mode = _resolve_ngp_mode("dw2", precision)
    fwd_mode = _resolve_ngp_mode("fwd", precision)
    if fwd_mode == "vpu" and lf > 24:
        # The per-channel FMA chain unrolls LF plane-sized temporaries;
        # Mosaic's register allocator spills them to scoped VMEM (measured:
        # LF=39 f32 spilled 129 MB on v5e — an OOM). Large encodings take
        # the [h,LF]x[LF,M] dot instead: with HIGHEST precision it is the
        # same f32 class the staged arm's head matmuls use.
        fwd_mode = "dot"
    dot_prec = (
        jax.lax.Precision.DEFAULT if precision == "bf16"
        else jax.lax.Precision.HIGHEST
    )
    dims_dw2 = (((1,), (1,)), ((), ()))  # [4,M] x [h,M] -> [4,h]
    dims_dw1 = (((1,), (1,)), ((), ()))  # [LF,M] x [h,M] -> [LF,h]
    dims_denc = (((1,), (0,)), ((), ()))  # [LF,h] x [h,M] -> [LF,M]
    dims_base = (((1,), (0,)), ((), ()))  # [h,LF] x [LF,M] -> [h,M]
    phys_row = ops.phys_row
    head_variant = _resolve_head_variant()
    win_dt = (
        jnp.bfloat16
        if (
            precision == "f32_fastbwd"
            or (precision in ("f32", "f32_high")
                and _resolve_f32_win() == "bf16")
        )
        else jnp.float32
    )

    def fslot_i(j):
        return jax.lax.rem(j + 20, 5)

    def gslot_i(j):
        return jax.lax.rem(j + 9, 3)

    def eslot_i(j):
        return jax.lax.rem(j + 9, 3)

    def kernel(z0_ref, ts_ref, enc_ref, w1c_ref, w1hk_ref, tb1_ref, w2_ref,
               w2hk_ref, b2_ref, *rest):
        if need_denc:
            (part_ref, denc_ref, dw1_ref, db1x_ref, dtw1x_ref, dw2_ref,
             db2x_ref, fwin, gwin, bwin, ewin) = rest
        else:
            (part_ref, dw1_ref, db1x_ref, dtw1x_ref, dw2_ref,
             db2x_ref, fwin, gwin, bwin, ewin) = rest
            denc_ref = None
        i = pl.program_id(0)
        z0 = z0_ref[0, 0]  # first global row of this shard's range

        @pl.when(i == 0)
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1x_ref[...] = jnp.zeros_like(db1x_ref)
            dtw1x_ref[...] = jnp.zeros_like(dtw1x_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2x_ref[...] = jnp.zeros_like(db2x_ref)

        b2 = b2_ref[...]  # [1, 4]

        # ---- stage 1: head forward for logical field row L = i-2 ----------
        enc = enc_ref[0]  # [LF, pny, pnx] (row phys(L) via the index map)
        ewin[eslot_i(i)] = enc.astype(win_dt)
        if fwd_mode == "vpu":
            base = w1hk_ref[:, 0:1][..., None] * enc[0]
            for c in range(1, lf):
                base = base + w1hk_ref[:, c : c + 1][..., None] * enc[c]
        else:
            basef = jax.lax.dot_general(
                w1hk_ref[...], enc.reshape(lf, m),
                dimension_numbers=dims_base,
                preferred_element_type=jnp.float32, precision=dot_prec,
            )
            base = basef.reshape(h, pny, pnx)
        bwin[eslot_i(i)] = base.astype(win_dt)
        slot_f = fslot_i(i)
        for s in range(3):
            z1 = base + tb1_ref[:, s : s + 1][..., None]
            a1 = jnp.maximum(z1, 0.0)
            if fwd_mode == "vpu":
                for o in range(4):
                    fwin[slot_f, s * 4 + o] = (
                        jnp.sum(a1 * w2hk_ref[:, o : o + 1][..., None], axis=0)
                        + b2[0, o]
                    )
            else:
                a1f = a1.reshape(h, m)
                w2c = w2_ref[...]
                if precision == "bf16":
                    a1f = a1f.astype(jnp.bfloat16)
                    w2c = w2c.astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    w2c, a1f, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=dot_prec,
                )  # [4, M]
                outr = out.reshape(4, pny, pnx)
                for o in range(4):
                    fwin[slot_f, s * 4 + o] = outr[o] + b2[0, o]

        # ---- stage 2: residual + cotangents, local row r = i-3 -------------
        @pl.when(i >= 2)
        def _():
            r = i - 3
            r_sigma, r_ux, r_uy, r_uz = ops.stage2_residuals(
                fwin[fslot_i(i - 2)], fwin[fslot_i(i - 1)], fwin[fslot_i(i)]
            )

            @pl.when(jnp.logical_and(r >= 0, r < nz_local))
            def _():
                rr = jnp.clip(r, 0, nz_local - 1)
                part_ref[0, rr] = jnp.sum(r_sigma * r_sigma)
                part_ref[1, rr] = (
                    jnp.sum(r_ux * r_ux) + jnp.sum(r_uy * r_uy)
                    + jnp.sum(r_uz * r_uz)
                )

            sg = gslot_i(i)
            gwin[sg, 0] = r_sigma * ops.ss
            gwin[sg, 1] = r_ux * ops.su
            gwin[sg, 2] = r_uy * ops.su
            gwin[sg, 3] = r_uz * ops.su

        # ---- stage 3: stencil adjoint + head backward, row d = z0+i-4 ------
        @pl.when(i >= 4)
        def _():
            d = z0 + i - 4  # GLOBAL row (clamp corrections key on it)
            gy_rows = ops.stage3_adjoint(
                fwin[fslot_i(i - 3)],
                fwin[fslot_i(i - 2)],
                fwin[fslot_i(i - 1)],
                gwin[gslot_i(i - 2)],
                gwin[gslot_i(i - 1)],
                gwin[gslot_i(i)],
                d,
            )
            base_f = bwin[eslot_i(i - 2)].reshape(h, m).astype(jnp.float32)
            enc_f = ewin[eslot_i(i - 2)].reshape(lf, m).astype(jnp.float32)
            enc_in = (
                enc_f.astype(jnp.bfloat16) if precision == "bf16" else enc_f
            )
            w1c = w1c_ref[...]
            if precision == "bf16":
                w1c = w1c.astype(jnp.bfloat16)
            if head_variant != "fused":
                dz1_sum = jnp.zeros((h, m), jnp.float32)
            denc_acc = None
            for s in range(3):
                gy = jnp.stack(gy_rows[s]).reshape(4, m)
                db2x_ref[...] = db2x_ref[...] + jnp.broadcast_to(
                    jnp.sum(gy, axis=1, keepdims=True), (4, pnx)
                )
                if head_variant != "base":
                    # one-expression ReLU: a1 doubles as the mask source
                    # (a1 > 0 iff z1 > 0; ties give 0 either way) and as
                    # the dW2 operand — no separate z1f / second relu.
                    a1f = jnp.maximum(base_f + tb1_ref[:, s : s + 1], 0.0)
                else:
                    z1f = base_f + tb1_ref[:, s : s + 1]
                if da1_mode == "vpu":
                    da1 = w2hk_ref[:, 0:1] * gy[0:1]
                    for o in range(1, 4):
                        da1 = da1 + w2hk_ref[:, o : o + 1] * gy[o : o + 1]
                else:
                    gy_in = (
                        gy.astype(jnp.bfloat16) if precision == "bf16" else gy
                    )
                    w2c = w2_ref[...]
                    if precision == "bf16":
                        w2c = w2c.astype(jnp.bfloat16)
                    da1 = jax.lax.dot_general(
                        w2c, gy_in,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=dot_prec,
                    )  # [h, M]
                if head_variant == "fused":
                    dz1 = jnp.where(a1f > 0.0, da1, 0.0)
                elif head_variant == "fused2":
                    dz1 = jnp.where(a1f > 0.0, da1, 0.0)
                    dz1_sum = dz1_sum + dz1
                else:
                    dz1 = jnp.where(z1f > 0.0, da1, 0.0)
                    dz1_sum = dz1_sum + dz1
                rowsum = jnp.sum(dz1, axis=1, keepdims=True)  # [h, 1]
                db1x_ref[...] = db1x_ref[...] + jnp.broadcast_to(
                    rowsum, (h, pnx)
                )
                dtw1x_ref[...] = dtw1x_ref[...] + ts_ref[0, s] * (
                    jnp.broadcast_to(rowsum, (h, pnx))
                )
                if head_variant == "base":
                    a1f = jnp.maximum(z1f, 0.0)
                if dw2_mode == "dot":
                    gy_in = (
                        gy.astype(jnp.bfloat16) if precision == "bf16" else gy
                    )
                    a1_in = (
                        a1f.astype(jnp.bfloat16)
                        if precision == "bf16"
                        else a1f
                    )
                    dw2_ref[...] = dw2_ref[...] + jax.lax.dot_general(
                        gy_in, a1_in, dimension_numbers=dims_dw2,
                        preferred_element_type=jnp.float32,
                        precision=dot_prec,
                    )
                else:
                    for o in range(4):
                        dw2_ref[:, o : o + 1] = dw2_ref[:, o : o + 1] + (
                            jnp.sum(a1f * gy[o : o + 1], axis=1, keepdims=True)
                        )
                if head_variant == "fused":
                    # per-slice K=M dots instead of the dz1_sum chain
                    # (f32 summation order differs from "base"; covered by
                    # the parity tolerances in tests/test_mega_ngp.py)
                    dz_in = (
                        dz1.astype(jnp.bfloat16)
                        if precision == "bf16"
                        else dz1
                    )
                    dw1_ref[...] = dw1_ref[...] + jax.lax.dot_general(
                        enc_in, dz_in, dimension_numbers=dims_dw1,
                        preferred_element_type=jnp.float32,
                        precision=dot_prec,
                    )
                    if denc_ref is not None:
                        dpart = jax.lax.dot_general(
                            w1c, dz_in, dimension_numbers=dims_denc,
                            preferred_element_type=jnp.float32,
                            precision=dot_prec,
                        )
                        denc_acc = (
                            dpart if denc_acc is None else denc_acc + dpart
                        )
            if head_variant == "fused":
                if denc_ref is not None:
                    denc_ref[0] = denc_acc.reshape(lf, pny, pnx)
            else:
                # dW1 (base rows): contraction over cells — K=M, MXU-friendly
                dz_in = (
                    dz1_sum.astype(jnp.bfloat16)
                    if precision == "bf16"
                    else dz1_sum
                )
                dw1_ref[...] = dw1_ref[...] + jax.lax.dot_general(
                    enc_in, dz_in, dimension_numbers=dims_dw1,
                    preferred_element_type=jnp.float32, precision=dot_prec,
                )
                if denc_ref is not None:
                    # dEnc row: [LF, M] = W1[:-1] @ dz1_sum (K = H)
                    denc = jax.lax.dot_general(
                        w1c, dz_in if precision == "bf16" else dz1_sum,
                        dimension_numbers=dims_denc,
                        preferred_element_type=jnp.float32,
                        precision=dot_prec,
                    )
                    denc_ref[0] = denc.reshape(lf, pny, pnx)

    if ext_mode:
        # pre-extended encoding: ext row i IS logical field row z0 + i - 2
        def enc_idx(i):
            return (i, 0, 0, 0)
    else:
        def enc_idx(i):
            return (phys_row(i - 2), 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, lf, pny, pnx), enc_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((lf, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, lf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    denc_spec = [
        pl.BlockSpec(
            (1, lf, pny, pnx),
            lambda i: (jnp.clip(i - 4, 0, nz_local - 1), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] if need_denc else []
    denc_shape = (
        [jax.ShapeDtypeStruct((nz_local, lf, pny, pnx), jnp.float32)]
        if need_denc
        else []
    )
    out_specs = tuple(
        [pl.BlockSpec((2, nz_local), lambda i: (0, 0),
                      memory_space=pltpu.SMEM)]
        + denc_spec
        + [
            pl.BlockSpec((lf, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, pnx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, pnx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, h) if dw2_mode == "dot" else (h, 4),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, pnx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct((2, nz_local), jnp.float32)]
        + denc_shape
        + [
            jax.ShapeDtypeStruct((lf, h), jnp.float32),
            jax.ShapeDtypeStruct((h, pnx), jnp.float32),
            jax.ShapeDtypeStruct((h, pnx), jnp.float32),
            jax.ShapeDtypeStruct(
                (4, h) if dw2_mode == "dot" else (h, 4), jnp.float32
            ),
            jax.ShapeDtypeStruct((4, pnx), jnp.float32),
        ]
    )
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((5, 12, pny, pnx), jnp.float32),  # field window
            pltpu.VMEM((3, 4, pny, pnx), jnp.float32),   # cotangent window
            pltpu.VMEM((3, h, pny, pnx), win_dt),   # layer-1 base rows
            pltpu.VMEM((3, lf, pny, pnx), win_dt),  # encoding rows
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * lf * h + 9 * h * 4 + 4 * lf * h) * g.num_cells
            + 300 * g.num_cells,
            bytes_accessed=2 * lf * g.num_cells * 4,
            transcendentals=0,
        ),
    )


def ngp_loss_and_grad(
    g: GridSpec,
    w: PhysWeights,
    ncfg: "ngp_mod.NGPFieldConfig",
    params: dict,
    t,
    precision: str = "f32",
    interpret=None,
):
    """(loss, (grad_params, grad_t)) for the NGP field model from ONE kernel
    pass plus the (scatter-free) encoder VJP. Falls back to jax.grad through
    the staged pipeline for planes the kernel cannot align.

    Gradient surface matches jax.value_and_grad of
    ops.total_loss(g, w, ngp.generate_fields(...)) — parity pinned by
    tests/test_mega_ngp.py."""
    if interpret is None:
        interpret = _default_interpret()
    if not ngp_supported(g):
        # staged fallback: jax.grad through the XLA pipeline
        from phys_autodiff_tpu import ops as _ops

        def total(p, tt):
            fs = ngp_mod.generate_fields(g, ncfg, p, tt, g.dt, precision)
            return _ops.total_loss(g, w, fs)

        loss, (grads, d_t) = jax.value_and_grad(total, argnums=(0, 1))(
            params, jnp.float32(t)
        )
        return loss, (grads, d_t)

    assert ncfg.out == 4, "kernel head is fixed to the 4 physics channels"
    lf = ncfg.encoding.out_dim
    h = ncfg.hidden
    t = jnp.float32(t)
    dt = jnp.float32(g.dt)
    ts = jnp.stack([t - dt, t, t + dt])  # [3]

    # Parameter-free encodings (empty "tables" pytree) need no dEnc: the
    # pullback would be all-empty, so the kernel skips its one grid-sized
    # output and the K=H dot entirely (need_denc=False).
    has_enc_params = any(
        leaf.size > 0 for leaf in jax.tree_util.tree_leaves(params["tables"])
    )
    # bf16 tier: the kernel truncates enc (and its dEnc cotangent feeds a
    # bf16-class gradient) anyway, so the encoder fwd/VJP runs the family's
    # fast variant (DEFAULT-precision resamples for the hash family).
    fast_enc = precision == "bf16"
    if has_enc_params:
        enc_zcf, enc_vjp = jax.vjp(
            lambda tb: encode_grid_zcf(ncfg.encoding, tb, g, fast=fast_enc),
            params["tables"],
        )  # [nz, LF, ny, nx]
    else:
        enc_zcf = encode_grid_zcf(
            ncfg.encoding, params["tables"], g, fast=fast_enc
        )
    if mega_flat(g):
        enc_k = enc_zcf.reshape(g.nz, lf, flat_rows(g), 128)
    else:
        enc_k = enc_zcf
    w1 = params["W1"]  # [LF+1, H]
    w1c = w1[:-1]  # [LF, H]
    tb1 = params["b1"][:, None] + w1[-1][:, None] * ts[None, :]  # [H, 3]
    w2t = params["W2"].T  # [4, H]
    b2 = params["b2"].reshape(1, 4)
    call = _build_ngp_bwd_call(
        g, lf, h, w, precision, interpret, need_denc=has_enc_params
    )
    z0 = jnp.zeros((1, 1), jnp.int32)
    outs = call(
        z0, ts.reshape(1, 3), enc_k, w1c, w1c.T, tb1, w2t, params["W2"], b2
    )
    if has_enc_params:
        parts, denc, dw1g, db1x, dtw1x, dw2g, db2x = outs
    else:
        parts, dw1g, db1x, dtw1x, dw2g, db2x = outs
    ls, lu = ops_loss.sum_partials(g, w, parts)
    db1 = db1x[:, 0]
    dtw1 = dtw1x[:, 0]
    dw2 = dw2g.T if _resolve_ngp_mode("dw2", precision) == "dot" else dw2g
    dw1_full = jnp.concatenate([dw1g, dtw1[None, :]], axis=0)  # [LF+1, H]
    if has_enc_params:
        denc_grid = denc.reshape(g.nz, lf, g.ny, g.nx)
        (d_tables,) = enc_vjp(denc_grid)
    else:
        d_tables = jax.tree.map(jnp.zeros_like, params["tables"])
    d_t = jnp.sum(w1[-1] * db1)
    grads = {
        "tables": d_tables,
        "W1": dw1_full,
        "b1": db1,
        "W2": dw2,
        "b2": db2x[:, 0],
    }
    return ls + lu, (grads, d_t)


def ngp_loss_and_grad_sharded(
    g: GridSpec,
    w: PhysWeights,
    ncfg: "ngp_mod.NGPFieldConfig",
    mesh,
    precision: str = "f32",
    interpret=None,
):
    """Returns fn(params, t) -> (loss, (grad_params, grad_t)) running the
    NGP backward mega-kernel PER SHARD under shard_map over the mesh's z
    axis (the NGP analogue of mega_bwd.mega_loss_and_grad_sharded):

      * the encoding is SHARD-LOCAL: each shard resamples only its own z
        rows + the 2+2 halo rows (encode_grid_zcf_rows — the z resample is
        separable, so a row subset costs rows/nz of the full-grid work),
        so the encoder weak-scales and no halo communication is needed;
      * each shard's kernel covers its [z0, z0+nz_local) rows; its dEnc
        rows (zero-padded at the halo positions — every global row's
        cotangent is emitted exactly once, by its owning shard) pull back
        through the shard-local encoder VJP, and the partial d_tables are
        psum'd — no grid-sized all-gather anywhere;
      * parameter-gradient partials are psum'd; the loss combines gathered
        per-plane partials in the fixed global order (sum_partials), so
        sharded == single-chip at the 1e-7 doctrine."""
    from jax.sharding import PartitionSpec as P

    from phys_autodiff_tpu.parallel.mesh import Z_AXIS

    if interpret is None:
        interpret = _default_interpret()
    assert ngp_supported(g)
    assert ncfg.out == 4
    n_shards = mesh.shape[Z_AXIS]
    nz = g.nz
    assert nz % n_shards == 0
    nz_local = nz // n_shards
    lf = ncfg.encoding.out_dim
    h = ncfg.hidden
    dt = jnp.float32(g.dt)
    pny = flat_rows(g) if mega_flat(g) else g.ny
    pnx = 128 if mega_flat(g) else g.nx

    def local(params, t):
        has_enc = any(
            leaf.size > 0
            for leaf in jax.tree_util.tree_leaves(params["tables"])
        )
        call = _build_ngp_bwd_call(
            g, lf, h, w, precision, interpret, nz_local=nz_local,
            need_denc=has_enc,
        )
        t = jnp.float32(t)
        ts = jnp.stack([t - dt, t, t + dt])
        me = jax.lax.axis_index(Z_AXIS)
        z0 = (me * nz_local).astype(jnp.int32)
        rows = z0 - 2 + jnp.arange(nz_local + 4)
        rows = rows % nz if g.periodic else jnp.clip(rows, 0, nz - 1)
        fast_enc = precision == "bf16"  # same tier rule as the single-chip step
        if has_enc:
            enc_rows, enc_vjp = jax.vjp(
                lambda tb: encode_grid_zcf_rows(
                    ncfg.encoding, tb, g, rows, fast=fast_enc
                ),
                params["tables"],
            )  # [nz_local + 4, LF, ny, nx]
        else:
            enc_rows = encode_grid_zcf_rows(
                ncfg.encoding, params["tables"], g, rows, fast=fast_enc
            )
        enc_ext = enc_rows.reshape(nz_local + 4, lf, pny, pnx)
        w1 = params["W1"]
        w1c = w1[:-1]
        tb1 = params["b1"][:, None] + w1[-1][:, None] * ts[None, :]
        outs = call(
            z0.reshape(1, 1), ts.reshape(1, 3), enc_ext, w1c, w1c.T, tb1,
            params["W2"].T, params["W2"], params["b2"].reshape(1, 4)
        )
        if has_enc:
            parts, denc, dw1g, db1x, dtw1x, dw2g, db2x = outs
        else:
            parts, dw1g, db1x, dtw1x, dw2g, db2x = outs
        parts_all = jax.lax.all_gather(parts, Z_AXIS, axis=1, tiled=True)
        ls, lu = ops_loss.sum_partials(g, w, parts_all)
        if has_enc:
            # dEnc covers this shard's OWN rows only; the 2+2 halo positions
            # of the pre-extended block get zero cotangent (their owning
            # shard emits them), so the psum'd pullback counts every row
            # exactly once.
            denc_pad = jnp.pad(
                denc.reshape(nz_local, lf, g.ny, g.nx),
                ((2, 2), (0, 0), (0, 0), (0, 0)),
            )
            (d_tables_part,) = enc_vjp(denc_pad)
            d_tables = jax.lax.psum(d_tables_part, Z_AXIS)
        else:
            # parameter-free encoders (Fourier): no dEnc was computed and
            # the gradient is the all-empty pytree — nothing to reduce.
            d_tables = jax.tree.map(jnp.zeros_like, params["tables"])
        db1 = jax.lax.psum(db1x, Z_AXIS)[:, 0]
        dtw1 = jax.lax.psum(dtw1x, Z_AXIS)[:, 0]
        dw1g_s = jax.lax.psum(dw1g, Z_AXIS)
        dw2g_s = jax.lax.psum(dw2g, Z_AXIS)
        db2 = jax.lax.psum(db2x, Z_AXIS)[:, 0]
        dw2 = (
            dw2g_s.T if _resolve_ngp_mode("dw2", precision) == "dot" else dw2g_s
        )
        grads = {
            "tables": d_tables,
            "W1": jnp.concatenate([dw1g_s, dtw1[None, :]], axis=0),
            "b1": db1,
            "W2": dw2,
            "b2": db2,
        }
        d_t = jnp.sum(w1[-1] * db1)
        return ls + lu, grads, d_t

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def loss_and_grad(params, t):
        loss, grads, d_t = sharded(params, t)
        return loss, (grads, d_t)

    return loss_and_grad
