"""The fused backward mega-kernel (pallas/mega_bwd.py): one Pallas pass
computing the loss and ALL parameter gradients — the analogue of the
reference's k_backward_fused (src/phys_cuda_fused.cu:102-172) extended
through the MLP backward (src/mlp_cuda.cu:39-89), with the hand-derived
stencil adjoint verified against jax.grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import generate_fields, mlp
from phys_autodiff_tpu.pallas.mega_bwd import mega_loss_and_grad
from phys_autodiff_tpu.utils.config import (
    CoordNorm,
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

GRID = dict(nx=128, ny=8, nz=6, hx=0.3, hy=0.35, hz=0.4, dt=1e-2)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)


def _cat(gp):
    return np.concatenate([np.asarray(gp[k], np.float64).ravel() for k in sorted(gp)])


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
@pytest.mark.parametrize("norm", [CoordNorm.MinusOneToOne, CoordNorm.ZeroToOne])
def test_mega_bwd_matches_jax_grad(periodic, norm):
    g = GridSpec(periodic=periodic, **GRID)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    cfg = MLPGridConfig(dims=MLPDims(H=32), norm=norm)
    params = mlp.init_params(cfg.dims, seed=3)
    t = jnp.float32(0.25)

    def staged(p, tt):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, tt, g.dt))

    l_ref, (gp_ref, gt_ref) = jax.value_and_grad(staged, argnums=(0, 1))(params, t)
    l, (gp, gt) = jax.jit(
        lambda p, tt: mega_loss_and_grad(g, w, cfg, p, tt, "f32", True)
    )(params, t)

    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 5e-6
    # f32-noise criteria (both arms are f32 programs; see test_slab_grad's
    # tolerance doctrine): tight on the global norm, looser per component.
    assert _rel(_cat(gp_ref), _cat(gp)) < 1e-4
    for k in gp_ref:
        assert _rel(gp_ref[k], gp[k]) < 1e-3, k
    assert abs(float(gt_ref) - float(gt)) / max(abs(float(gt_ref)), 1e-30) < 1e-3


def test_mega_bwd_h64_single_chunk():
    """H=64 exercises the single-H-chunk path."""
    g = GridSpec(**GRID)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=64))
    params = mlp.init_params(cfg.dims, seed=9)
    t = jnp.float32(0.4)

    def staged(p):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, t, g.dt))

    l_ref, gp_ref = jax.value_and_grad(staged)(params)
    l, (gp, _) = mega_loss_and_grad(g, w, cfg, params, t, "f32", True)
    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 5e-6
    assert _rel(_cat(gp_ref), _cat(gp)) < 1e-4


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_mega_bwd_upwind_matches_jax_grad(periodic):
    """The hand-derived UPWIND adjoint (frozen wind selectors, split
    backward/forward branch weights — round-2 VERDICT #5) reproduces
    jax.grad of the staged upwind loss; previously this config fell back to
    the slab-scan gradient."""
    g = GridSpec(scheme="upwind", periodic=periodic, **GRID)
    w = PhysWeights(w_sigma=1.2, w_u=0.8)
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=1)
    t = jnp.float32(0.25)

    def staged(p, tt):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, tt, g.dt))

    l_ref, (gp_ref, gt_ref) = jax.value_and_grad(staged, argnums=(0, 1))(params, t)
    l, (gp, gt) = jax.jit(
        lambda p, tt: mega_loss_and_grad(g, w, cfg, p, tt, "f32", True)
    )(params, t)
    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 5e-6
    assert _rel(_cat(gp_ref), _cat(gp)) < 1e-4
    for k in gp_ref:
        assert _rel(gp_ref[k], gp[k]) < 1e-3, k
    assert abs(float(gt_ref) - float(gt)) / max(abs(float(gt_ref)), 1e-30) < 1e-3


def test_mega_bwd_unsupported_plane_falls_back_to_slab():
    """ny*nx % 128 != 0 routes through the slab gradient (same answer)."""
    g = GridSpec(nx=12, ny=10, nz=5, hx=0.3, hy=0.35, hz=0.4, dt=1e-2)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=16))
    params = mlp.init_params(cfg.dims, seed=1)
    t = jnp.float32(0.25)

    from phys_autodiff_tpu.pallas.mega_bwd import mega_supported
    from phys_autodiff_tpu.train.slab_grad import make_slab_loss_and_grad

    assert not mega_supported(g)
    l_ref, (gp_ref, _) = make_slab_loss_and_grad(g, w, cfg)(params, t)
    l, (gp, _) = mega_loss_and_grad(g, w, cfg, params, t, "f32", True)
    assert float(l) == float(l_ref)
    for k in gp_ref:
        assert np.array_equal(np.asarray(gp[k]), np.asarray(gp_ref[k])), k


@pytest.mark.parametrize("dw2m", ["dot", "vpu"])
@pytest.mark.parametrize("da1m", ["dot", "vpu"])
@pytest.mark.parametrize("fwdm", ["dot", "vpu"])
def test_mega_bwd_contraction_modes_agree(dw2m, da1m, fwdm, monkeypatch):
    """Every dW2/da1/fwd contraction-strategy combination (the MXU-vs-VPU
    forms auto-selected per precision on hardware) computes the same
    gradients — the mode switch is a pure scheduling choice."""
    from phys_autodiff_tpu.pallas import mega_bwd as mb

    g = GridSpec(**GRID)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=5)
    t = jnp.float32(0.3)

    l_ref, (gp_ref, gt_ref) = mega_loss_and_grad(g, w, cfg, params, t, "f32", True)
    monkeypatch.setattr(mb, "_DW2_MODE", dw2m)
    monkeypatch.setattr(mb, "_DA1_MODE", da1m)
    monkeypatch.setattr(mb, "_FWD_MODE", fwdm)
    l, (gp, gt) = mega_loss_and_grad(g, w, cfg, params, t, "f32", True)
    # All arms are f32 programs of the same math; they differ only in
    # FMA/accumulation order, so parity is f32-noise-tight, not bitwise.
    assert abs(float(l) - float(l_ref)) <= 1e-6 * abs(float(l_ref))
    assert _rel(_cat(gp_ref), _cat(gp)) < 2e-5
    assert abs(float(gt) - float(gt_ref)) <= 1e-4 * max(abs(float(gt_ref)), 1e-30)


@pytest.mark.parametrize("hk", [16, 32])
def test_mega_bwd_hk_chunking(hk):
    """The H-chunk size is a pure scheduling knob: any divisor of H gives
    the same kernel outputs (here driven through _build_bwd_call directly,
    H=32 split into 1/2 chunks vs the default)."""
    import numpy as np

    from phys_autodiff_tpu.pallas import mega_bwd as mb
    from phys_autodiff_tpu.pallas.mega import fold_tables_mega

    g = GridSpec(**GRID)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=7)
    t = jnp.float32(0.2)
    ts = jnp.stack([t - g.dt, t, t + g.dt])
    ab, cd, w2t, b2 = fold_tables_mega(g, cfg, params, ts)
    z0 = jnp.zeros((1, 1), jnp.int32)
    h = 32
    nz, ny, nx = g.shape

    def run(hk_arg):
        call = mb._build_bwd_call(g, h, w, "f32", True, hk=hk_arg)
        return call(z0, ab, ab.reshape(h, ny * nx), cd, w2t, w2t.T, b2)

    ref = run(None)
    out = run(hk)
    for a, b in zip(ref, out):
        a, b = np.asarray(a), np.asarray(b)
        # chunked accumulation reorders f32 sums; near-cancelling elements
        # need an absolute floor scaled to the output's magnitude
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-4 * max(np.max(np.abs(a)), 1e-30)
        )


def test_mega_bwd_scaled_weights():
    """The (2w/N) cotangent scales flow correctly for non-unit weights."""
    g = GridSpec(**GRID)
    w = PhysWeights(w_sigma=0.25, w_u=3.5)
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=11)
    t = jnp.float32(0.1)

    def staged(p):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, t, g.dt))

    l_ref, gp_ref = jax.value_and_grad(staged)(params)
    l, (gp, _) = mega_loss_and_grad(g, w, cfg, params, t, "f32", True)
    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 5e-6
    assert _rel(_cat(gp_ref), _cat(gp)) < 1e-4


# --- FLAT layout: unaligned nx (round-3 VERDICT #3) -------------------------

FLAT_GRIDS = [
    dict(nx=64, ny=16, nz=6, hx=0.3, hy=0.35, hz=0.4, dt=1e-2),   # R=8
    dict(nx=96, ny=16, nz=5, hx=0.25, hy=0.3, hz=0.5, dt=2e-2),   # R=12
]


def test_mega_supported_accepts_flat_grids():
    from phys_autodiff_tpu.pallas.mega_bwd import mega_flat, mega_supported

    for spec in FLAT_GRIDS:
        g = GridSpec(**spec)
        assert mega_supported(g) and mega_flat(g), spec
    # the reference's own unaligned benchmark grids are now one-kernel
    assert mega_supported(GridSpec(nx=64, ny=64, nz=64, hx=.05, hy=.05, hz=.05, dt=1e-3))
    assert mega_supported(GridSpec(nx=96, ny=96, nz=64, hx=.05, hy=.05, hz=.05, dt=1e-3))
    # ny*nx % 128 != 0 still falls back
    assert not mega_supported(GridSpec(nx=12, ny=7, nz=5, hx=.1, hy=.1, hz=.1, dt=1e-3))
    # upwind is served by the hand-derived adjoint (round-3)
    assert mega_supported(
        GridSpec(nx=64, ny=16, nz=6, hx=.1, hy=.1, hz=.1, dt=1e-3, scheme="upwind")
    )


@pytest.mark.parametrize("spec", FLAT_GRIDS, ids=["64x16", "96x16"])
@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_mega_bwd_flat_matches_jax_grad(spec, periodic):
    """The flat-layout kernel (planes as [R, 128] lane rows, flat
    cyclic-shift adjoint) reproduces jax.grad of the staged loss on the
    unaligned grids the packed layout cannot serve."""
    g = GridSpec(periodic=periodic, **spec)
    w = PhysWeights(w_sigma=1.1, w_u=0.9)
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=3)
    t = jnp.float32(0.25)

    def staged(p, tt):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, tt, g.dt))

    l_ref, (gp_ref, gt_ref) = jax.value_and_grad(staged, argnums=(0, 1))(params, t)
    l, (gp, gt) = jax.jit(
        lambda p, tt: mega_loss_and_grad(g, w, cfg, p, tt, "f32", True)
    )(params, t)

    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 5e-6
    assert _rel(_cat(gp_ref), _cat(gp)) < 1e-4
    for k in gp_ref:
        assert _rel(gp_ref[k], gp[k]) < 1e-3, k
    assert abs(float(gt_ref) - float(gt)) / max(abs(float(gt_ref)), 1e-30) < 1e-3


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_mega_bwd_upwind_flat_matches_jax_grad(periodic):
    """Upwind adjoint x flat layout (both round-3 additions composed)."""
    g = GridSpec(scheme="upwind", periodic=periodic, **FLAT_GRIDS[0])
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=16))
    params = mlp.init_params(cfg.dims, seed=2)
    t = jnp.float32(0.3)

    def staged(p, tt):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, tt, g.dt))

    l_ref, (gp_ref, _) = jax.value_and_grad(staged, argnums=(0, 1))(params, t)
    l, (gp, _) = jax.jit(
        lambda p, tt: mega_loss_and_grad(g, w, cfg, p, tt, "f32", True)
    )(params, t)
    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 5e-6
    assert _rel(_cat(gp_ref), _cat(gp)) < 1e-4
    for k in gp_ref:
        assert _rel(gp_ref[k], gp[k]) < 1e-3, k
