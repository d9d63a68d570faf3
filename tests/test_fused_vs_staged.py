"""Tier-3 parity: Pallas fused kernels vs the XLA-staged ops path.

Port of test/test_phys_cuda_fused_vs_nonfused.cpp — both arms are f32, so the
tolerances are tight: rel_l2 <= 1e-7, max_abs <= 1e-6 on residuals and
backward (:74-108). Runs the kernels in interpreter mode on the CPU backend
(grids kept small; the real-TPU arm is exercised by bench.py and
scripts/tpu_parity.py on hardware).

Both kernel variants are covered: the manual-DMA slab kernel (nx % 128 == 0)
and the BlockSpec plane kernel (any nx).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.ops.stencil import FieldSnapshots
from phys_autodiff_tpu.pallas import (
    loss_backward_fused,
    loss_forward_fused,
    residuals_fused,
)
from phys_autodiff_tpu.ref import manufactured
from phys_autodiff_tpu.utils import tolerances as tol
from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights
from phys_autodiff_tpu.utils.metrics import max_abs_err, rel_l2_err

L = 2 * np.pi

# Small grids (interpret mode is slow on the 1-core CI host).
SLAB_GRID = dict(nx=128, ny=16, nz=8)  # nx%128==0 -> manual-DMA slab kernel
PLANE_GRID = dict(nx=24, ny=16, nz=6)  # nx%128!=0 -> BlockSpec plane kernel
# nz=48 -> 3 slabs: exercises the contiguous interior-DMA fast path (the
# n_slabs<=2 grids above only ever take the edge-DMA path)
SLAB3_GRID = dict(nx=128, ny=8, nz=48)


def _spec(periodic=True, **dims):
    return GridSpec(
        **dims,
        hx=L / dims["nx"],
        hy=L / dims["ny"],
        hz=L / dims["nz"],
        dt=1e-3,
        periodic=periodic,
    )


def _snapshots(g):
    """Manufactured solution 2 (divergence-free u), like the reference fused
    parity test (test/test_phys_cuda_fused_vs_nonfused.cpp:30-51)."""
    f = manufactured.solution2_fields(g, 0.7)
    return FieldSnapshots(**{k: jnp.asarray(v) for k, v in f.items()})


@pytest.mark.parametrize(
    "dims", [SLAB_GRID, PLANE_GRID, SLAB3_GRID], ids=["slab", "plane", "slab3"]
)
@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_residuals_fused_vs_staged(dims, periodic):
    g = _spec(periodic=periodic, **dims)
    fs = _snapshots(g)
    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    rs_f, ru_f = residuals_fused(g, fs)
    assert rel_l2_err(rs_f, rs_s) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(rs_f, rs_s) <= tol.FUSED_VS_STAGED_MAX
    assert rel_l2_err(ru_f, ru_s) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(ru_f, ru_s) <= tol.FUSED_VS_STAGED_MAX


@pytest.mark.parametrize("dims", [SLAB_GRID, PLANE_GRID], ids=["slab", "plane"])
def test_loss_backward_fused_vs_staged(dims):
    g = _spec(**dims)
    fs = _snapshots(g)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    rs_s, ru_s = ops.residuals(g, fs)
    gs_s, gu_s = ops.loss_backward(g, w, rs_s, ru_s)
    gs_f, gu_f = loss_backward_fused(g, w, fs)
    assert rel_l2_err(gs_f, gs_s) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(gs_f, gs_s) <= tol.FUSED_VS_STAGED_MAX
    assert rel_l2_err(gu_f, gu_s) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(gu_f, gu_s) <= tol.FUSED_VS_STAGED_MAX


@pytest.mark.parametrize("dims", [SLAB_GRID, PLANE_GRID], ids=["slab", "plane"])
def test_loss_forward_fused_vs_f64(dims):
    """The in-kernel-reduced loss vs the f64 host reduction (1e-7 doctrine).

    Capability beyond the reference: its fused loss forward was planned but
    never implemented (docs/PLAN_FUSED_PHYS_LOSS.md:59)."""
    g = _spec(**dims)
    fs = _snapshots(g)
    w = PhysWeights(w_sigma=1.7, w_u=0.9)
    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls_f, lu_f = loss_forward_fused(g, w, fs)
    assert abs(float(ls_f) - float(ls64)) / abs(float(ls64)) <= 1e-6
    assert abs(float(lu_f) - float(lu64)) / abs(float(lu64)) <= 1e-6


def test_fused_custom_vjp_matches_staged_grad():
    """Gradients THROUGH the fused op (custom_vjp field adjoint) must match
    jax.grad through the staged path — this is what lets the fused kernel sit
    inside the training loop."""
    g = _spec(**PLANE_GRID)
    fs = _snapshots(g)
    w = PhysWeights(w_sigma=1.1, w_u=0.9)

    def loss_via(res_fn):
        def f(x):
            rs, ru = res_fn(g, x)
            ls, lu = ops.loss_terms(g, w, rs, ru)
            return ls + lu

        return f

    gr_f = jax.jit(jax.grad(loss_via(residuals_fused)))(fs)
    gr_s = jax.jit(jax.grad(loss_via(ops.residuals)))(fs)
    for name in fs._fields:
        assert (
            rel_l2_err(getattr(gr_f, name), getattr(gr_s, name))
            <= tol.FUSED_VS_STAGED_REL
        ), name


def test_packed_kernels_match_staged():
    """Packed-layout fused kernels (one-DMA fast path) vs staged ops."""
    from phys_autodiff_tpu.pallas import (
        loss_forward_fused_packed,
        pack_fields,
        residuals_fused_packed,
        unpack_fields,
    )

    g = _spec(**SLAB3_GRID)  # 3 slabs: interior + edge DMA paths
    fs = _snapshots(g)
    packed = pack_fields(fs)
    # pack/unpack bijection
    fs2 = unpack_fields(packed)
    for name in fs._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(fs, name)), np.asarray(getattr(fs2, name))
        )

    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    out = residuals_fused_packed(g, packed)
    assert rel_l2_err(out[0], rs_s) <= tol.FUSED_VS_STAGED_REL
    assert rel_l2_err(out[1:4], ru_s) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(out[0], rs_s) <= tol.FUSED_VS_STAGED_MAX

    w = PhysWeights(1.7, 0.9)
    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls, lu = loss_forward_fused_packed(g, w, packed)
    assert abs(float(ls) - float(ls64)) / abs(float(ls64)) <= 1e-6
    assert abs(float(lu) - float(lu64)) / abs(float(lu64)) <= 1e-6


def test_packed_mlp_pipeline_matches_plain():
    """Packed fused MLP generation + packed loss == staged pipeline, and the
    whole chain is differentiable."""
    from phys_autodiff_tpu.models import mlp
    from phys_autodiff_tpu.models.fields import generate_fields
    from phys_autodiff_tpu.pallas import (
        fused_loss_pipeline,
        generate_fields_fused_packed,
        unpack_fields,
    )
    from phys_autodiff_tpu.utils.config import MLPDims, MLPGridConfig

    g = GridSpec(nx=128, ny=16, nz=8, dt=1e-3)
    cfg = MLPGridConfig(dims=MLPDims(H=64))
    params = mlp.init_params(cfg.dims, seed=123, scale=0.25)
    w = PhysWeights()

    fs_plain = generate_fields(g, cfg, params, 0.25, g.dt)
    fs_packed = unpack_fields(generate_fields_fused_packed(g, cfg, params, 0.25))
    for name in fs_plain._fields:
        assert (
            rel_l2_err(getattr(fs_packed, name), getattr(fs_plain, name))
            <= tol.MLP_INFER_REL
        ), name

    def lp(p):
        ls, lu = fused_loss_pipeline(g, w, cfg, p, 0.25)
        return ls + lu

    def ls_fn(p):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, 0.25, g.dt))

    assert abs(float(lp(params)) - float(ls_fn(params))) <= 1e-4 * abs(
        float(ls_fn(params))
    )
    gp = jax.jit(jax.grad(lp))(params)
    gs = jax.jit(jax.grad(ls_fn))(params)
    cat = lambda gr: np.concatenate([np.asarray(gr[k]).ravel() for k in sorted(gr)])
    assert rel_l2_err(cat(gp), cat(gs)) <= 5e-3


def test_packed_bf16io_mixed_precision_class():
    """The bf16-I/O packed kernel (reference M4 mixed-precision arm): f32
    in-kernel arithmetic on bf16 fields, bf16 residuals out. The stencil's
    1/h factors amplify the bf16 field rounding, so the class is a few
    percent relative, checked against the staged f32 op on the same
    bf16-rounded inputs."""
    from phys_autodiff_tpu.pallas.residuals import (
        pack_fields,
        residuals_fused_packed_bf16,
    )

    g = GridSpec(nx=128, ny=16, nz=8, hx=0.3, hy=0.3, hz=0.3, dt=1e-2)
    fs = _snapshots(g)
    fs16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), fs)
    fs16_as_f32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), fs16)
    rs_ref, ru_ref = ops.residuals(g, fs16_as_f32)
    out = residuals_fused_packed_bf16(g, pack_fields(fs16), True)
    rs, ru = out[0].astype(jnp.float32), out[1:].astype(jnp.float32)
    # identical math on identical (bf16-rounded) inputs; only the output
    # rounding differs -> bf16-epsilon relative
    assert rel_l2_err(rs, rs_ref) <= 4e-3
    assert rel_l2_err(ru, ru_ref) <= 4e-3


def test_bf16_io_kernels_differentiable():
    """Round 3: the mixed-precision residual kernels carry custom VJPs (the
    f32 field adjoint of the staged op with straight-through dtype casts),
    checked against jax.grad of the explicit cast-wrapped staged function.
    Closes the round-2 'bf16 arms are non-differentiable' API hole."""
    from phys_autodiff_tpu.pallas.residuals import (
        grid_to_flat,
        pack_fields,
        residuals_fused_flat_bf16,
        residuals_fused_packed_bf16,
        residuals_fused_packed_mixed_out,
        _flat_residuals_ops,
        _packed_residuals_ops,
    )

    g = GridSpec(nx=128, ny=16, nz=8, hx=0.3, hy=0.3, hz=0.3, dt=1e-2)
    fs = _snapshots(g)
    packed = pack_fields(fs)
    probe = jnp.asarray(
        np.random.Generator(np.random.MT19937(5)).standard_normal(
            (4,) + g.shape
        ),
        jnp.float32,
    )

    def check(kernel_fn, ref_fn, x):
        gk = jax.grad(
            lambda p: jnp.sum(kernel_fn(p).astype(jnp.float32) * probe)
        )(x)
        gr = jax.grad(
            lambda p: jnp.sum(ref_fn(p).astype(jnp.float32) * probe)
        )(x)
        assert gk.dtype == gr.dtype == x.dtype
        assert rel_l2_err(
            gk.astype(jnp.float32), gr.astype(jnp.float32)
        ) <= 1e-6

    # bf16 in / bf16 out (packed)
    check(
        lambda p: residuals_fused_packed_bf16(g, p, True),
        lambda p: _packed_residuals_ops(g, p.astype(jnp.float32)).astype(
            jnp.bfloat16
        ),
        packed.astype(jnp.bfloat16),
    )
    # f32 in / bf16 out (packed)
    check(
        lambda p: residuals_fused_packed_mixed_out(g, p, True),
        lambda p: _packed_residuals_ops(g, p).astype(jnp.bfloat16),
        packed,
    )
    # bf16 in / bf16 out (flat layout)
    gfl = GridSpec(nx=24, ny=16, nz=6, hx=0.3, hy=0.3, hz=0.3, dt=1e-2)
    fsf = _snapshots(gfl)
    flat16 = grid_to_flat(gfl, pack_fields(fsf)).astype(jnp.bfloat16)
    probe_f = jnp.asarray(
        np.random.Generator(np.random.MT19937(7)).standard_normal(
            (4, gfl.nz, (gfl.ny * gfl.nx) // 128, 128)
        ),
        jnp.float32,
    )

    def scalf(fn):
        return lambda p: jnp.sum(fn(p).astype(jnp.float32) * probe_f)

    gk = jax.grad(scalf(lambda p: residuals_fused_flat_bf16(gfl, p, True)))(
        flat16
    )
    gr = jax.grad(
        scalf(
            lambda p: _flat_residuals_ops(gfl, p.astype(jnp.float32)).astype(
                jnp.bfloat16
            )
        )
    )(flat16)
    assert gk.dtype == gr.dtype == jnp.bfloat16
    assert rel_l2_err(gk.astype(jnp.float32), gr.astype(jnp.float32)) <= 1e-6


# ---------------------------------------------------------------------------
# FLAT-layout kernels (nx % 128 != 0, ny*nx % 128 == 0)
# ---------------------------------------------------------------------------

# The flat layout reinterprets each plane as ny*nx/128 lane rows — the
# reference's own flat x-fastest layout chunked into 128-lane rows. These
# grids exercise R>1 with nx<128 and the R=1 single-row edge case.
FLAT_GRID = dict(nx=24, ny=16, nz=6)  # R = 3
FLAT_GRID_R1 = dict(nx=16, ny=8, nz=4)  # R = 1 (row-roll degenerate case)


@pytest.mark.parametrize(
    "dims", [FLAT_GRID, FLAT_GRID_R1], ids=["flat", "flat_r1"]
)
@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
@pytest.mark.parametrize("scheme", ["central", "upwind"])
def test_flat_residuals_vs_staged(dims, periodic, scheme):
    from phys_autodiff_tpu.pallas.residuals import (
        grid_to_flat,
        pack_fields_flat,
        residuals_fused_flat,
    )

    import dataclasses

    g = dataclasses.replace(_spec(periodic=periodic, **dims), scheme=scheme)
    fs = _snapshots(g)
    out = residuals_fused_flat(g, pack_fields_flat(g, fs))
    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    ref = grid_to_flat(g, jnp.concatenate([rs_s[None], ru_s], axis=0))
    assert rel_l2_err(out, ref) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(out, ref) <= tol.FUSED_VS_STAGED_MAX


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_flat_loss_fwd_bwd_vs_staged(periodic):
    from phys_autodiff_tpu.ops import loss as ops_loss
    from phys_autodiff_tpu.pallas.residuals import (
        grid_to_flat,
        loss_backward_fused_flat,
        loss_forward_fused_flat,
        pack_fields_flat,
    )

    g = _spec(periodic=periodic, **FLAT_GRID)
    fs = _snapshots(g)
    flat = pack_fields_flat(g, fs)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    rs_s, ru_s = ops.residuals(g, fs)
    # Loss vs the f64 host-reduction arm (the 1e-7-doctrine carrier, same
    # check as the packed kernel tests).
    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls, lu = loss_forward_fused_flat(g, w, flat)
    assert abs(float(ls) - float(ls64)) / abs(float(ls64)) <= 1e-6
    assert abs(float(lu) - float(lu64)) / abs(float(lu64)) <= 1e-6

    gs_s, gu_s = ops_loss.loss_backward(g, w, rs_s, ru_s)
    refb = grid_to_flat(g, jnp.concatenate([gs_s[None], gu_s], axis=0))
    gb = loss_backward_fused_flat(g, w, flat)
    assert rel_l2_err(gb, refb) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(gb, refb) <= tol.FUSED_VS_STAGED_MAX


def test_flat_custom_vjp_matches_staged_grad():
    from phys_autodiff_tpu.ops import loss as ops_loss
    from phys_autodiff_tpu.pallas.residuals import (
        flat_to_grid,
        loss_forward_fused_flat,
        pack_fields_flat,
        unpack_fields,
    )

    g = _spec(**FLAT_GRID)
    fs = _snapshots(g)
    flat = pack_fields_flat(g, fs)
    w = PhysWeights()

    def fused(p):
        ls, lu = loss_forward_fused_flat(g, w, p)
        return ls + lu

    def staged(p):
        rs, ru = ops.residuals(g, unpack_fields(flat_to_grid(g, p)))
        ls, lu = ops_loss.loss_terms(g, w, rs, ru)
        return ls + lu

    gf = jax.grad(fused)(flat)
    gs = jax.grad(staged)(flat)
    assert rel_l2_err(gf, gs) <= 1e-6
    assert max_abs_err(gf, gs) <= 1e-6


def test_flat_mlp_pipeline_matches_plain():
    """Flat fused MLP generation + flat loss kernel == staged pipeline at an
    unaligned-nx grid, and the whole chain is differentiable."""
    from phys_autodiff_tpu.models import mlp
    from phys_autodiff_tpu.models.fields import generate_fields
    from phys_autodiff_tpu.pallas import generate_fields_fused_flat
    from phys_autodiff_tpu.pallas.mlp import fused_loss_pipeline
    from phys_autodiff_tpu.pallas.residuals import (
        grid_to_flat,
        loss_forward_fused_flat,
        pack_fields,
    )
    from phys_autodiff_tpu.utils.config import MLPDims, MLPGridConfig

    g = GridSpec(nx=24, ny=16, nz=6, dt=1e-3)
    cfg = MLPGridConfig(dims=MLPDims(H=64))
    params = mlp.init_params(cfg.dims, seed=123, scale=0.25)
    w = PhysWeights()

    flat = generate_fields_fused_flat(g, cfg, params, 0.25)
    ref = grid_to_flat(g, pack_fields(generate_fields(g, cfg, params, 0.25, g.dt)))
    assert rel_l2_err(flat, ref) <= tol.MLP_INFER_REL

    def lp(p):
        ls, lu = loss_forward_fused_flat(
            g, w, generate_fields_fused_flat(g, cfg, p, 0.25)
        )
        return ls + lu

    def ls_fn(p):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, 0.25, g.dt))

    assert abs(float(lp(params)) - float(ls_fn(params))) <= 1e-4 * abs(
        float(ls_fn(params))
    )
    gp = jax.jit(jax.grad(lp))(params)
    gs = jax.jit(jax.grad(ls_fn))(params)
    cat = lambda gr: np.concatenate([np.asarray(gr[k]).ravel() for k in sorted(gr)])
    assert rel_l2_err(cat(gp), cat(gs)) <= 5e-3


def test_packed_mixed_out_and_split_arms_match_base():
    """Round-3 DMA-experiment arms: the f32-in/bf16-out kernel equals the
    base kernel up to bf16 output rounding, and the split-stream kernel is
    BIT-IDENTICAL (same arithmetic, only the DMA structure differs)."""
    from phys_autodiff_tpu.bench.harness import random_fields
    from phys_autodiff_tpu.pallas.residuals import (
        pack_fields,
        residuals_fused_packed,
        residuals_fused_packed_mixed_out,
        residuals_fused_packed_split,
    )

    g = GridSpec(nx=128, ny=16, nz=6, hx=0.3, hy=0.35, hz=0.4, dt=1e-2)
    packed = pack_fields(random_fields(g, seed=5))
    base = np.asarray(residuals_fused_packed(g, packed, True))

    mixed = residuals_fused_packed_mixed_out(g, packed, True)
    assert mixed.dtype == jnp.bfloat16
    scale = np.max(np.abs(base))
    assert np.max(np.abs(np.asarray(mixed, np.float32) - base)) <= 1e-2 * scale

    split = residuals_fused_packed_split(g, packed[:6], packed[6:], True)
    np.testing.assert_array_equal(np.asarray(split), base)


@pytest.mark.parametrize("nx", [128, 64])
def test_loss_backward_fused_packed_matches_staged(nx):
    """The packed-layout reference-shaped scaled backward (g = 2wR/N in one
    recompute kernel — round-2 VERDICT missing #5) matches the staged hand
    VJP; unaligned nx routes through the flat kernel."""
    from phys_autodiff_tpu.bench.harness import random_fields
    from phys_autodiff_tpu.pallas.residuals import (
        loss_backward_fused_packed,
        pack_fields,
    )

    g = GridSpec(nx=nx, ny=16, nz=6, hx=0.3, hy=0.35, hz=0.4, dt=1e-2)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    fs = random_fields(g, seed=8)
    rs, ru = ops.residuals(g, fs)
    gs, gu = ops.loss_backward(g, w, rs, ru)
    ref = np.concatenate([np.asarray(gs)[None], np.asarray(gu)], axis=0)
    out = np.asarray(loss_backward_fused_packed(g, w, pack_fields(fs), True))
    assert rel_l2_err(out, ref) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(out, ref) <= tol.FUSED_VS_STAGED_MAX


def test_flat_bf16_pads_rows_to_sublane_tile():
    """Round-3 VERDICT #2: at flat row counts R with no 16-multiple divisor
    (the reference's 96x96x64 grid has R=72) the bf16 fieldgen pads the AB
    table to the next 16-multiple with masked junk rows, so the in-kernel
    f32->bf16 activation cast rides the (16, 128) bf16 sublane tile. The
    padded arm must (a) keep the output shape/contract, (b) match the
    staged pipeline at bf16 tolerance, (c) leave f32 unpadded."""
    from phys_autodiff_tpu.models import mlp
    from phys_autodiff_tpu.models.fields import generate_fields
    from phys_autodiff_tpu.pallas import generate_fields_fused_flat
    from phys_autodiff_tpu.pallas.mlp import _flat_pad_rows, _pick_rb_flat
    from phys_autodiff_tpu.pallas.residuals import grid_to_flat, pack_fields
    from phys_autodiff_tpu.utils.config import MLPDims, MLPGridConfig

    # pad policy itself: the benchmark grids' row counts
    assert _flat_pad_rows(72, "bf16") == 80  # 96x96x64
    assert _flat_pad_rows(32, "bf16") == 32  # 64^3: already aligned
    assert _flat_pad_rows(72, "f32") == 72  # f32 tile is 8 rows
    assert _pick_rb_flat(80, 128, "bf16") == 16

    # end-to-end on a CPU-sized unaligned grid: ny*nx/128 = 9 -> pad to 16
    g = GridSpec(nx=64, ny=18, nz=6, dt=1e-3)
    cfg = MLPGridConfig(dims=MLPDims(H=64))
    params = mlp.init_params(cfg.dims, seed=123, scale=0.25)
    r = (g.ny * g.nx) // 128
    assert r == 9 and _flat_pad_rows(r, "bf16") == 16

    flat_bf16 = generate_fields_fused_flat(g, cfg, params, 0.25, "bf16", True)
    assert flat_bf16.shape == (12, g.nz, r, 128)  # junk rows sliced off
    ref = grid_to_flat(g, pack_fields(generate_fields(g, cfg, params, 0.25, g.dt)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(flat_bf16 - ref))) <= 1e-2 * scale

    flat_f32 = generate_fields_fused_flat(g, cfg, params, 0.25, "f32", True)
    assert rel_l2_err(flat_f32, ref) <= tol.MLP_INFER_REL


# ---------------------------------------------------------------------------
# Padded-lane layout (round-5 arm: unaligned nx padded up to 128 lanes)
# ---------------------------------------------------------------------------

# nx=96 -> px=128 (the benchmark-grid pad ratio, 4/3); nz=48 -> 3 slabs so
# the contiguous interior-DMA path runs, not just the edge path.
PAD_GRID = dict(nx=96, ny=8, nz=48)


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
@pytest.mark.parametrize("scheme", ["central", "upwind"])
def test_padlanes_residuals_vs_staged(periodic, scheme):
    """True lanes of the halo-padded kernel == staged ops (bitwise on
    hardware): the pad lanes carry the wrap/clamp x-continuation, so pure
    lane rolls read correct neighbors at every true lane."""
    import dataclasses

    from phys_autodiff_tpu.pallas.residuals import (
        pack_fields_pad,
        pad_to_grid,
        residuals_fused_padlanes,
    )

    g = dataclasses.replace(_spec(periodic=periodic, **PAD_GRID), scheme=scheme)
    fs = _snapshots(g)
    out = pad_to_grid(g, residuals_fused_padlanes(g, pack_fields_pad(g, fs)))
    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    ref = jnp.concatenate([rs_s[None], ru_s], axis=0)
    assert rel_l2_err(out, ref) <= tol.FUSED_VS_STAGED_REL
    assert max_abs_err(out, ref) <= tol.FUSED_VS_STAGED_MAX


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_padlanes_loss_fwd_vs_f64_and_vjp(periodic):
    """In-kernel-reduced padded loss (junk lanes masked out of the sums) vs
    the f64 host reduction, and gradients through the padded op vs the
    staged grad (junk-lane input cotangents must be exactly zero)."""
    from phys_autodiff_tpu.ops import loss as ops_loss
    from phys_autodiff_tpu.pallas.residuals import (
        loss_forward_fused_padlanes,
        pack_fields_pad,
        pad_to_grid,
        padded_px,
        unpack_fields,
    )

    g = _spec(periodic=periodic, **PAD_GRID)
    fs = _snapshots(g)
    padded = pack_fields_pad(g, fs)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls, lu = loss_forward_fused_padlanes(g, w, padded)
    assert abs(float(ls) - float(ls64)) / abs(float(ls64)) <= 1e-6
    assert abs(float(lu) - float(lu64)) / abs(float(lu64)) <= 1e-6

    def fused(p):
        a, b = loss_forward_fused_padlanes(g, w, p)
        return a + b

    def staged(p):
        rs, ru = ops.residuals(g, unpack_fields(pad_to_grid(g, p)))
        a, b = ops_loss.loss_terms(g, w, rs, ru)
        return a + b

    gf = jax.grad(fused)(padded)
    gs = jax.grad(staged)(padded)
    assert rel_l2_err(gf, gs) <= 1e-6
    assert max_abs_err(gf, gs) <= 1e-6
    # pad-lane input cotangents are identically zero (both sides)
    from phys_autodiff_tpu.pallas.residuals import pad_off

    px, off = padded_px(g), pad_off(g)
    assert px == 128 and off == (px - g.nx) // 2
    assert float(jnp.max(jnp.abs(gf[..., :off]))) == 0.0
    assert float(jnp.max(jnp.abs(gf[..., off + g.nx :]))) == 0.0


def test_padlanes_bf16io_matches_flat_bf16():
    """bf16-I/O halo-padded kernel == bf16-I/O flat kernel bitwise (same
    bf16 inputs upcast to identical f32 arithmetic), and its class vs the
    f32 staged arm is the usual bf16 1e-3 window."""
    from phys_autodiff_tpu.pallas.residuals import (
        flat_to_grid,
        pack_fields_flat,
        pack_fields_pad,
        pad_to_grid,
        residuals_fused_flat_bf16,
        residuals_fused_padlanes_bf16,
    )

    g = _spec(**PAD_GRID)
    fs = _snapshots(g)
    pad16 = pack_fields_pad(g, fs).astype(jnp.bfloat16)
    flat16 = pack_fields_flat(g, fs).astype(jnp.bfloat16)
    out_pad = pad_to_grid(g, residuals_fused_padlanes_bf16(g, pad16))
    out_flat = flat_to_grid(g, residuals_fused_flat_bf16(g, flat16))
    assert max_abs_err(out_pad, out_flat) == 0.0

    # identical math on identical bf16-rounded inputs vs the staged f32 op
    # on the same inputs; only the output rounding differs (the class bound
    # test_packed_bf16io_mixed_precision_class uses)
    fs16_as_f32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32), fs
    )
    rs_ref, ru_ref = ops.residuals(g, fs16_as_f32)
    ref = jnp.concatenate([rs_ref[None], ru_ref], axis=0)
    assert rel_l2_err(out_pad.astype(jnp.float32), ref) <= 4e-3

    # differentiable: the bf16 VJP runs and pad-lane cotangents are zero
    def s(p):
        o = residuals_fused_padlanes_bf16(g, p)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(s)(pad16)
    from phys_autodiff_tpu.pallas.residuals import pad_off

    off = pad_off(g)
    assert float(jnp.max(jnp.abs(gk[..., :off].astype(jnp.float32)))) == 0.0
    assert jnp.all(jnp.isfinite(gk.astype(jnp.float32)))
