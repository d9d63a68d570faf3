"""Parity tests for the slab-blocked recompute backward (train/slab_grad.py).

Tolerance doctrine: both the slab gradient and plain jax.grad are float32
programs whose reduction orders differ; each sits ~1e-5 relative from the
float64 ground truth on ill-conditioned components (verified in f64 during
development — the slab arm is the closer of the two on bias gradients). The
arms are therefore compared to each other at 3e-4 relative L2, mirroring how
the reference relaxes CPU(double)↔CUDA(float) parity to 3e-4
(test/test_phys_cuda_nonfused_vs_cpu.cpp:86-92) while keeping the loss at
the tight 1e-6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import generate_fields, mlp
from phys_autodiff_tpu.train import loop as train_loop
from phys_autodiff_tpu.train.slab_grad import (
    make_fused_loss,
    make_slab_loss_and_grad,
    pick_slab_rows,
    slab_fields_rows,
)
from phys_autodiff_tpu.utils.config import (
    CoordNorm,
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

GRID = dict(nx=16, ny=8, nz=12, hx=0.3, hy=0.3, hz=0.3, dt=1e-2)


def _staged_value_and_grad(g, w, cfg, params, t):
    def loss(p, tt):
        return ops.total_loss(g, w, generate_fields(g, cfg, p, tt, g.dt))

    return jax.value_and_grad(loss, argnums=(0, 1))(params, jnp.float32(t))


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("norm", [CoordNorm.MinusOneToOne, CoordNorm.ZeroToOne])
def test_slab_grad_matches_jax_grad(periodic, norm):
    g = GridSpec(periodic=periodic, **GRID)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    cfg = MLPGridConfig(dims=MLPDims(H=32), norm=norm)
    params = mlp.init_params(cfg.dims, seed=3)
    t = 0.25

    l_ref, (gp_ref, gt_ref) = _staged_value_and_grad(g, w, cfg, params, t)
    lg = make_slab_loss_and_grad(g, w, cfg, sz=4)
    l_s, (gp_s, gt_s) = jax.jit(lg)(params, jnp.float32(t))

    # both losses are on-device f32 sums in different orders (per-slab vs
    # whole-grid); the 1e-7 doctrine applies to the host-f64 reduction arm
    assert abs(float(l_ref) - float(l_s)) / abs(float(l_ref)) < 5e-6
    # global criterion tight; per-component looser (bias gradients are
    # whole-grid cancellation sums, noise-bound in f32 for BOTH arms)
    cat = lambda gp: np.concatenate(
        [np.asarray(gp[k], np.float64).ravel() for k in sorted(gp)]
    )
    assert _rel_l2(cat(gp_ref), cat(gp_s)) < 1e-4
    for k in gp_ref:
        assert _rel_l2(gp_ref[k], gp_s[k]) < 1e-3, k
    assert abs(float(gt_ref) - float(gt_s)) / max(abs(float(gt_ref)), 1e-30) < 3e-4


def test_slab_fields_match_staged_fields():
    """The rank-1 slab field generator reproduces the staged generator's
    fields on its rows (1e-6 — same math, different association)."""
    g = GridSpec(**GRID)
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=5)
    t, dt = jnp.float32(0.3), jnp.float32(g.dt)
    fs = generate_fields(g, cfg, params, t, dt)

    idx = jnp.mod(jnp.arange(-1, 5), g.nz)
    ts = jnp.stack([t - dt, t, t + dt])
    sigma, u = slab_fields_rows(g, cfg, params, ts, idx)
    ref_sigma = jnp.stack([fs.sigma_tm1, fs.sigma_t, fs.sigma_tp1])[:, idx]
    ref_u = jnp.stack([fs.u_tm1, fs.u_t, fs.u_tp1])[:, :, idx]
    assert _rel_l2(ref_sigma, sigma) < 1e-6
    assert _rel_l2(ref_u, u) < 1e-6


def test_fused_loss_custom_vjp():
    """make_fused_loss: forward == fused pipeline loss, value_and_grad
    gradients == the slab gradients."""
    g = GridSpec(**GRID)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=7)
    t = jnp.float32(0.25)

    loss = make_fused_loss(g, w, cfg, sz=4)
    l, gp = jax.jit(jax.value_and_grad(loss))(params, t)
    l_ref, (gp_ref, _) = _staged_value_and_grad(g, w, cfg, params, t)
    assert abs(float(l) - float(l_ref)) / abs(float(l_ref)) < 1e-5
    for k in gp_ref:
        assert _rel_l2(gp_ref[k], gp[k]) < 3e-4, k


def test_fused_train_step_matches_staged():
    """TrainConfig(use_fused=True) trains the same trajectory as the staged
    step (loss history within 1e-4 relative at every logged step)."""
    g = GridSpec(**GRID)
    w = PhysWeights()
    mcfg = MLPGridConfig(dims=MLPDims(H=16))
    steps = 15
    hists = {}
    for fused in (False, True):
        cfg = train_loop.TrainConfig(
            use_fused=fused, steps=steps, learning_rate=3e-3, log_every=5
        )
        _, hist, _ = train_loop.fit(g, w, mcfg, cfg)
        hists[fused] = hist
    for (s0, l0), (s1, l1) in zip(hists[False], hists[True]):
        assert s0 == s1
        assert abs(l0 - l1) / max(abs(l0), 1e-12) < 1e-4
    # the reference's M6 acceptance: loss drops (>=90% over the full run is
    # checked in test_train; here just sanity that it decreases)
    assert hists[True][-1][1] < hists[True][0][1]


def test_pick_slab_rows_divides():
    g = GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    sz = pick_slab_rows(g, h=128)
    assert g.nz % sz == 0 and sz >= 1


def test_slab_grad_large_virtual_grid_compiles():
    """The memory win: a grid whose [3N, H] activation residual would be
    ~7 GB compiles and runs under the slab backward (tiny slab budget forces
    many slabs). Uses a modest H to keep CPU runtime sane."""
    g = GridSpec(nx=64, ny=32, nz=16, hx=0.1, hy=0.1, hz=0.1, dt=1e-2)
    cfg = MLPGridConfig(dims=MLPDims(H=16))
    params = mlp.init_params(cfg.dims, seed=1)
    lg = make_slab_loss_and_grad(g, PhysWeights(), cfg, sz=2)
    l, (gp, _) = jax.jit(lg)(params, jnp.float32(0.1))
    assert np.isfinite(float(l))
    assert all(np.all(np.isfinite(np.asarray(v))) for v in gp.values())
