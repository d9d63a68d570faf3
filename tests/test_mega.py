"""The MLP->residual->loss mega-kernel (pallas/mega.py) — the reference's
own declared next step (docs/BENCHMARK_REPORT.md:61-62,
docs/PLAN_MLP_SMOKE_INTEGRATION.md:51), which it never built."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import generate_fields, mlp
from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline
from phys_autodiff_tpu.utils.config import (
    CoordNorm,
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

GRID = dict(nx=128, ny=8, nz=6, hx=0.3, hy=0.3, hz=0.3, dt=1e-2)


def _setup(seed=3, h=32, norm=CoordNorm.MinusOneToOne, **grid_kw):
    g = GridSpec(**{**GRID, **grid_kw})
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    cfg = MLPGridConfig(dims=MLPDims(H=h), norm=norm)
    params = mlp.init_params(cfg.dims, seed=seed)
    return g, w, cfg, params


def _staged(g, w, cfg, params, t):
    fs = generate_fields(g, cfg, params, t, g.dt)
    return ops.loss_forward(g, w, fs)


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
@pytest.mark.parametrize("scheme", ["central", "upwind"])
def test_mega_matches_staged_pipeline(periodic, scheme):
    g, w, cfg, params = _setup(periodic=periodic, scheme=scheme)
    t = jnp.float32(0.25)
    ls_ref, lu_ref = _staged(g, w, cfg, params, t)
    ls, lu = jax.jit(
        lambda p: mega_loss_pipeline(g, w, cfg, p, t, "f32", True)
    )(params)
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 1e-5
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 1e-5


def test_mega_zero_to_one_norm():
    """The t+0.5 ZeroToOne quirk flows through the folded tables."""
    g, w, cfg, params = _setup(norm=CoordNorm.ZeroToOne)
    t = jnp.float32(0.3)
    ls_ref, lu_ref = _staged(g, w, cfg, params, t)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "f32", True)
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 1e-5
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 1e-5


def test_mega_odd_h_chunking():
    """H=64 exercises the single-chunk path, H=128 the two-chunk path."""
    for h in (64, 128):
        g, w, cfg, params = _setup(h=h)
        t = jnp.float32(0.25)
        ls_ref, lu_ref = _staged(g, w, cfg, params, t)
        ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "f32", True)
        assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 1e-5, h
        assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 1e-5, h


def test_mega_gradients_route_through_staged_adjoint():
    g, w, cfg, params = _setup()
    t = jnp.float32(0.25)

    def mega_total(p):
        ls, lu = mega_loss_pipeline(g, w, cfg, p, t, "f32", True)
        return ls + lu

    def staged_total(p):
        ls, lu = _staged(g, w, cfg, p, t)
        return ls + lu

    g1 = jax.grad(mega_total)(params)
    g2 = jax.grad(staged_total)(params)
    for k in g1:
        a, b = np.asarray(g1[k], np.float64), np.asarray(g2[k], np.float64)
        assert np.linalg.norm(a - b) <= 1e-12 * max(np.linalg.norm(b), 1.0), k


@pytest.mark.parametrize("nx", [48, 96])
@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
@pytest.mark.parametrize("scheme", ["central", "upwind"])
def test_mega_unaligned_nx_flat_layout(nx, periodic, scheme):
    """nx not 128-aligned with ny*nx % 128 == 0 runs the FLAT plane layout
    (round 3 — no padded junk lanes; at 64^3 the padding doubled the lane
    work, most of the mega-vs-two-kernel gap)."""
    g, w, cfg, params = _setup(nx=nx, periodic=periodic, scheme=scheme)
    t = jnp.float32(0.25)
    ls_ref, lu_ref = _staged(g, w, cfg, params, t)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "f32", True)
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 1e-5
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 1e-5


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_mega_unaligned_plane_lane_padding(periodic):
    """ny*nx % 128 != 0 still runs the padded-lane path: boundary-corrected
    x-shifts wrap/clamp at the TRUE extent, junk lanes masked out of the
    loss reduction."""
    g, w, cfg, params = _setup(nx=12, periodic=periodic)
    assert (g.ny * g.nx) % 128 != 0
    t = jnp.float32(0.25)
    ls_ref, lu_ref = _staged(g, w, cfg, params, t)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "f32", True)
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 1e-5
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 1e-5


@pytest.mark.parametrize(
    "nx,ny,want_flat",
    [
        # rows=96*16/128=12 (not a 16-mult), ny%16==0, pad 128/96=1.33:
        # bf16 routes to the PADDED layout (flat would pay the (16,128)
        # bf16 tile relayout per H-chunk — hardware-measured, DESIGN.md)
        (96, 16, False),
        # rows=32*16/128=4 but pad 128/32=4x junk lanes: stays FLAT
        (32, 16, True),
        # rows=96*24/128=18... not integer -> (64,32): rows=16, a 16-mult:
        # tile-clean flat, stays FLAT
        (64, 32, True),
    ],
)
def test_mega_bf16_layout_routing(nx, ny, want_flat, monkeypatch):
    """bf16 layout choice is precision-aware: parity holds on whichever
    layout the router picks, and the router picks the measured winner."""
    from phys_autodiff_tpu.pallas import mega

    picked = {}
    orig = mega._build_mega_call

    def spy(g, h, precision, interpret, flat=False):
        picked["flat"] = flat
        return orig(g, h, precision, interpret, flat=flat)

    monkeypatch.setattr(mega, "_build_mega_call", spy)
    g, w, cfg, params = _setup(nx=nx, ny=ny)
    t = jnp.float32(0.25)
    ls_ref, lu_ref = _staged(g, w, cfg, params, t)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "bf16", True)
    assert picked["flat"] == want_flat
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 5e-2
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 5e-2


def test_mega_bf16_within_mixed_precision_tolerance():
    g, w, cfg, params = _setup()
    t = jnp.float32(0.25)
    ls_ref, lu_ref = _staged(g, w, cfg, params, t)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "bf16", True)
    # REQUIREMENT.md:196-203's 1e-3 mixed-precision class applies to MLP
    # outputs; the finite-difference residual amplifies bf16 field rounding
    # by ~1/h, so the loss lands in the few-percent class.
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 5e-2
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 5e-2


@pytest.mark.parametrize("mode", ["dot", "vpu"])
def test_mega_fwd_contraction_modes_agree(mode, monkeypatch):
    """The layer-2 contraction strategy (MXU dot vs VPU weighted reduction,
    auto-selected per precision on hardware) is a pure scheduling choice:
    both arms compute the same loss to f32 accumulation-order noise."""
    from phys_autodiff_tpu.pallas import mega

    g, w, cfg, params = _setup()
    t = jnp.float32(0.25)
    ls_ref, lu_ref = mega_loss_pipeline(g, w, cfg, params, t, "f32", True)
    monkeypatch.setattr(mega, "_FWD_MODE", mode)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "f32", True)
    assert abs(float(ls) - float(ls_ref)) <= 1e-5 * abs(float(ls_ref))
    assert abs(float(lu) - float(lu_ref)) <= 1e-5 * abs(float(lu_ref))
