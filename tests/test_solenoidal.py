"""Tests for models/solenoidal.py (vector-potential field head).

Oracles: the discrete curl's divergence vanishes identically (operator
identity, both boundary modes, every model family), training through the
head satisfies a pinned loss drop, the continuous point curl is
analytically divergence-free (checked with nested forward AD), and the
grid curl converges to the point curl at the stencil's O(h^2) rate."""

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.models import mlp, solenoidal
from phys_autodiff_tpu.ops.diagnostics import divergence
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)


def _grid(periodic=True, nx=12, ny=10, nz=8):
    return GridSpec(nx=nx, ny=ny, nz=nz, hx=0.5, hy=0.25, hz=0.4,
                    dt=1e-2, periodic=periodic)


MCFG = MLPGridConfig(dims=MLPDims(H=32))


def test_grid_velocity_exactly_divfree_both_modes():
    params = mlp.init_params(MCFG.dims, seed=5, scale=0.5)
    for periodic in (True, False):
        g = _grid(periodic)
        sigma, u = solenoidal.grid_infer_solenoidal(g, MCFG, params, 0.3)
        assert sigma.shape == g.shape and u.shape == (3,) + g.shape
        scale = float(jnp.max(jnp.abs(u))) + 1e-30
        assert float(jnp.max(jnp.abs(divergence(g, u)))) <= 1e-5 * scale


def test_generate_fields_every_slice_divfree():
    g = _grid(periodic=True)
    params = mlp.init_params(MCFG.dims, seed=6, scale=0.5)
    fs = solenoidal.generate_fields_solenoidal(g, MCFG, params, 0.25, g.dt)
    for u in (fs.u_tm1, fs.u_t, fs.u_tp1):
        scale = float(jnp.max(jnp.abs(u))) + 1e-30
        assert float(jnp.max(jnp.abs(divergence(g, u)))) <= 1e-5 * scale
    assert fs.sigma_t.shape == g.shape


def test_training_drops_loss_and_preserves_divfree():
    from phys_autodiff_tpu.train import TrainConfig

    g = GridSpec(nx=16, ny=16, nz=8, hx=0.4, hy=0.4, hz=0.8, dt=1e-2)
    cfg = TrainConfig(steps=0, learning_rate=3e-3, t=0.25, seed=1)
    params0 = mlp.init_params(MCFG.dims, seed=1)
    step, state = solenoidal.make_solenoidal_train_step(
        g, PhysWeights(), MCFG, cfg, params0
    )
    first = None
    for _ in range(200):
        state, loss = step(state)
        if first is None:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(last) and last <= 0.2 * first, (first, last)
    # incompressibility is structural: still exact after 200 optimizer steps
    _, u = solenoidal.grid_infer_solenoidal(g, MCFG, state.params, 0.25)
    scale = float(jnp.max(jnp.abs(u))) + 1e-30
    assert float(jnp.max(jnp.abs(divergence(g, u)))) <= 1e-5 * scale


def test_encoder_family_head_divfree():
    from phys_autodiff_tpu.models import ngp

    from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig

    g = _grid(periodic=True)
    ncfg = ngp.NGPFieldConfig(
        encoding=HashEncodingConfig(num_levels=2, features_per_level=2,
                                    log2_table_size=6, base_resolution=4,
                                    max_resolution=8),
        hidden=16,
    )
    params = ngp.init_ngp_params(ncfg, seed=7)
    sigma, u = solenoidal.grid_infer_solenoidal(g, ncfg, params, 0.3)
    scale = float(jnp.max(jnp.abs(u))) + 1e-30
    assert float(jnp.max(jnp.abs(divergence(g, u)))) <= 1e-5 * scale


def test_point_curl_is_analytically_divfree():
    # nested forward AD: div u(x) = trace du/dx must vanish to rounding
    # (div of curl of the NETWORK function, not a discretization)
    g = _grid(periodic=True)
    params = mlp.init_params(MCFG.dims, seed=8, scale=0.5)
    inv_h = np.array([
        1.0 / ((g.nx - 1) * g.hx),
        1.0 / ((g.ny - 1) * g.hy),
        1.0 / ((g.nz - 1) * g.hz),
    ], np.float32)

    def u_at(p):  # [3] -> [3]
        _, u = solenoidal.eval_points_solenoidal(
            g, MCFG, params, p[None, :], 0.3
        )
        return u[0]

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 0.9, size=(8, 3)).astype(np.float32)
    for p in pts:
        J = jax.jacfwd(u_at)(jnp.asarray(p))  # J[c, a] = du_c/dunit_a
        div = float(J[0, 0] * inv_h[0] + J[1, 1] * inv_h[1]
                    + J[2, 2] * inv_h[2])
        scale = float(jnp.max(jnp.abs(J))) * float(inv_h.max()) + 1e-30
        assert abs(div) <= 5e-5 * scale, (div, scale)


def test_grid_curl_converges_to_point_curl():
    # same physical box (extent 1 per axis), two resolutions: the discrete
    # curl's error against the continuous point curl at shared nodes must
    # shrink when h halves. The MLP is ReLU, so the field is only piecewise
    # smooth: nodes whose stencil straddles a kink converge at O(h) (and
    # dominate the max norm — measured O(sqrt h) there); the MEDIAN node is
    # kink-free and shows the stencil's true convergence (measured 3x per
    # halving at these sizes, collapsing to ~1e-5 by n=65).
    params = mlp.init_params(MCFG.dims, seed=9, scale=1.0)
    errs = []
    for n in (17, 33):
        h = 1.0 / (n - 1)
        g = GridSpec(nx=n, ny=n, nz=n, hx=h, hy=h, hz=h, dt=1e-2,
                     periodic=False)
        _, u_grid = solenoidal.grid_infer_solenoidal(g, MCFG, params, 0.3)
        # sample 64 interior nodes (avoid clamp edges where the stencil
        # degenerates to first order)
        idx = np.linspace(4, n - 5, 4).round().astype(int)
        pts = np.array([
            [ix / (n - 1), iy / (n - 1), iz / (n - 1)]
            for iz in idx for iy in idx for ix in idx
        ], np.float32)
        _, u_pt = solenoidal.eval_points_solenoidal(
            g, MCFG, params, jnp.asarray(pts), 0.3
        )
        u_g = np.array([
            np.asarray(u_grid[:, iz, iy, ix])
            for iz in idx for iy in idx for ix in idx
        ])
        errs.append(float(np.median(np.abs(u_g - np.asarray(u_pt)))))
    assert errs[1] <= 0.5 * errs[0], errs
