"""Tests for the arbitrary-point serving surface (models/sample.py) and the
particle-advection app (apps/advect.py).

Tier structure follows the repo doctrine: exact/analytic oracles first
(node-exactness, linear-field exactness, constant-velocity trajectories in
closed form), then cross-surface parity (points-vs-grid inference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu.apps import advect as adv
from phys_autodiff_tpu.models import fields, mlp, ngp, sample
from phys_autodiff_tpu.utils.config import (
    CoordNorm,
    GridSpec,
    MLPDims,
    MLPGridConfig,
)


def _grid(periodic=True, nx=8, ny=6, nz=5):
    return GridSpec(
        nx=nx, ny=ny, nz=nz, hx=0.5, hy=0.25, hz=0.125, dt=1e-3,
        periodic=periodic,
    )


def _node_points(g):
    """All grid nodes as unit coords [N, 3] (x, y, z) plus their (iz,iy,ix)."""
    iz, iy, ix = np.meshgrid(
        np.arange(g.nz), np.arange(g.ny), np.arange(g.nx), indexing="ij"
    )
    pts = np.stack(
        [
            ix.ravel() / max(g.nx - 1, 1),
            iy.ravel() / max(g.ny - 1, 1),
            iz.ravel() / max(g.nz - 1, 1),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(pts)


# ---------------------------------------------------------------- trilinear


@pytest.mark.parametrize("periodic", [True, False])
def test_trilinear_node_exactness(periodic):
    g = _grid(periodic)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(3,) + g.shape).astype(np.float32))
    pts_unit = _node_points(g)
    pts_idx = sample.unit_to_index(g, pts_unit)
    out = sample.trilinear_sample(vals, pts_idx, g)  # [N, 3]
    expect = np.moveaxis(np.asarray(vals).reshape(3, -1), 0, -1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=0, atol=1e-6)


def test_trilinear_linear_field_exact_interior():
    # interpolation of an affine-in-index field is exact at interior points
    g = _grid(periodic=False)
    iz, iy, ix = jnp.meshgrid(
        jnp.arange(g.nz, dtype=jnp.float32),
        jnp.arange(g.ny, dtype=jnp.float32),
        jnp.arange(g.nx, dtype=jnp.float32),
        indexing="ij",
    )
    vals = (1.5 + 2.0 * ix - 0.5 * iy + 0.25 * iz)[None]  # [1, nz, ny, nx]
    rng = np.random.default_rng(1)
    p = rng.uniform(
        [0, 0, 0], [g.nx - 1, g.ny - 1, g.nz - 1], size=(64, 3)
    ).astype(np.float32)
    out = sample.trilinear_sample(vals, jnp.asarray(p), g)[:, 0]
    expect = 1.5 + 2.0 * p[:, 0] - 0.5 * p[:, 1] + 0.25 * p[:, 2]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_trilinear_periodic_wrap():
    g = _grid(periodic=True)
    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    # index nx (one past the last node) wraps to node 0; negative wraps back
    p_wrap = jnp.asarray(
        [[g.nx, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, g.ny, g.nz]],
        dtype=jnp.float32,
    )
    p_eq = jnp.asarray(
        [[0.0, 0.0, 0.0], [g.nx - 1, 0.0, 0.0], [0.0, 0.0, 0.0]],
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(sample.trilinear_sample(vals, p_wrap, g)),
        np.asarray(sample.trilinear_sample(vals, p_eq, g)),
        rtol=0,
        atol=1e-6,
    )
    # halfway between the last node and the wrap image of node 0
    mid = sample.trilinear_sample(
        vals, jnp.asarray([[g.nx - 0.5, 0.0, 0.0]], jnp.float32), g
    )
    expect = 0.5 * (vals[0, 0, g.nx - 1] + vals[0, 0, 0])
    np.testing.assert_allclose(float(mid[0]), float(expect), rtol=1e-6)


def test_trilinear_clamp_boxes_queries():
    g = _grid(periodic=False)
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    out = sample.trilinear_sample(
        vals, jnp.asarray([[-3.0, 100.0, 2.0]], jnp.float32), g
    )
    expect = vals[2, g.ny - 1, 0]
    np.testing.assert_allclose(float(out[0]), float(expect), rtol=1e-6)


# ------------------------------------------------------- point model serving


@pytest.mark.parametrize("norm", [CoordNorm.MinusOneToOne, CoordNorm.ZeroToOne])
def test_mlp_points_match_grid_infer_at_nodes(norm):
    g = _grid(periodic=False, nx=6, ny=5, nz=4)
    cfg = MLPGridConfig(dims=MLPDims(), norm=norm)
    params = mlp.init_params(cfg.dims, seed=123, scale=0.25)
    t = 0.3
    y_grid = fields.grid_infer(g, cfg, params, t)  # [nz, ny, nx, 4]
    pts = _node_points(g)
    y_pts = sample.mlp_eval_points(cfg, params, pts, t)
    np.testing.assert_allclose(
        np.asarray(y_pts),
        np.asarray(y_grid).reshape(-1, 4),
        rtol=0,
        atol=0,
    )  # bit-identical: same coordinate rows, same pinned matmuls


def test_ngp_points_match_grid_infer_at_nodes():
    g = _grid(periodic=True, nx=6, ny=5, nz=4)
    ncfg = ngp.NGPFieldConfig()
    params = ngp.init_ngp_params(ncfg, seed=7)
    t = 0.25
    y_grid = ngp.grid_infer(g, ncfg, params, t)
    pts = _node_points(g)
    y_pts = sample.evaluate_points(ncfg, params, pts, t)
    np.testing.assert_allclose(
        np.asarray(y_pts),
        np.asarray(y_grid).reshape(-1, 4),
        rtol=2e-5,
        atol=2e-5,
    )  # pointwise encoder vs grid resampling: same math, different assoc.


def test_point_eval_is_differentiable_in_points():
    g = _grid(periodic=False)
    cfg = MLPGridConfig()
    params = mlp.init_params(cfg.dims, seed=5)
    pts = jnp.asarray([[0.3, 0.4, 0.5]], jnp.float32)

    def f(p):
        return jnp.sum(sample.mlp_eval_points(cfg, params, p, 0.1))

    gp = jax.grad(f)(pts)
    assert gp.shape == pts.shape
    assert bool(jnp.all(jnp.isfinite(gp)))


# ------------------------------------------------------------------- advect


def _const_velocity_params(u):
    """MLP params whose output is constant [0, ux, uy, uz]."""
    dims = MLPDims()
    return {
        "W1": jnp.zeros((dims.In, dims.H), jnp.float32),
        "b1": jnp.zeros((dims.H,), jnp.float32),
        "W2": jnp.zeros((dims.H, dims.Out), jnp.float32),
        "b2": jnp.asarray([0.0] + list(u), jnp.float32),
    }


@pytest.mark.parametrize("method", ["euler", "rk2"])
def test_advect_constant_velocity_analytic(method):
    g = _grid(periodic=True)
    cfg = MLPGridConfig()
    u = (1.0, -2.0, 0.5)
    vel = adv.velocity_fn_from_model(g, cfg, _const_velocity_params(u))
    acfg = adv.AdvectConfig(steps=40, dt=2e-2, method=method)
    pts0 = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], jnp.float32)
    final = jax.jit(lambda p: adv.advect(g, vel, p, 0.0, acfg))(pts0)
    T = acfg.steps * acfg.dt
    drift = np.asarray([u[0] / g.hx, u[1] / g.hy, u[2] / g.hz]) * T
    expect = (np.asarray(pts0) + drift) % np.asarray([g.nx, g.ny, g.nz])
    np.testing.assert_allclose(np.asarray(final), expect, rtol=1e-4, atol=1e-4)


def test_advect_clamp_boxes_particles():
    g = _grid(periodic=False)
    cfg = MLPGridConfig()
    vel = adv.velocity_fn_from_model(
        g, cfg, _const_velocity_params((-10.0, 0.0, 0.0))
    )
    acfg = adv.AdvectConfig(steps=20, dt=0.1, method="euler")
    final = adv.advect(g, vel, jnp.asarray([[3.0, 1.0, 1.0]]), 0.0, acfg)
    assert float(final[0, 0]) == 0.0  # pinned at the low x face


def test_advect_grid_sampler_matches_model_on_constant_field():
    g = _grid(periodic=True)
    u = (0.7, 0.3, -0.2)
    u_grid = jnp.broadcast_to(
        jnp.asarray(u, jnp.float32)[:, None, None, None], (3,) + g.shape
    )
    vel_g = adv.velocity_fn_from_grid(g, u_grid)
    cfg = MLPGridConfig()
    vel_m = adv.velocity_fn_from_model(g, cfg, _const_velocity_params(u))
    acfg = adv.AdvectConfig(steps=10, dt=5e-2)
    pts0 = jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32)
    fg = adv.advect(g, vel_g, pts0, 0.0, acfg)
    fm = adv.advect(g, vel_m, pts0, 0.0, acfg)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fm), atol=1e-5)


def test_advect_rk2_beats_euler_on_linear_velocity():
    # u_x(x) = a * x_phys  ->  x(t) = x0 * exp(a t); rk2's one-step error is
    # O(dt^3) vs euler's O(dt^2)
    g = GridSpec(nx=64, ny=2, nz=2, hx=1.0, hy=1.0, hz=1.0, dt=1e-3,
                 periodic=False)
    a = 0.9

    def vel(pts_idx, t):
        x_phys = pts_idx[:, 0:1] * g.hx
        return jnp.concatenate(
            [a * x_phys, jnp.zeros_like(x_phys), jnp.zeros_like(x_phys)],
            axis=-1,
        )

    x0, T, steps = 2.0, 1.0, 20
    expect = x0 * np.exp(a * T)
    pts0 = jnp.asarray([[x0, 0.0, 0.0]], jnp.float32)
    outs = {}
    for method in ("euler", "rk2"):
        acfg = adv.AdvectConfig(steps=steps, dt=T / steps, method=method)
        outs[method] = float(adv.advect(g, vel, pts0, 0.0, acfg)[0, 0])
    err_e = abs(outs["euler"] - expect)
    err_r = abs(outs["rk2"] - expect)
    assert err_r < err_e / 5, (outs, expect)


def test_advect_trajectory_recording():
    g = _grid(periodic=True)
    cfg = MLPGridConfig()
    vel = adv.velocity_fn_from_model(
        g, cfg, _const_velocity_params((1.0, 0.0, 0.0))
    )
    acfg = adv.AdvectConfig(steps=12, dt=1e-2, record_every=3)
    final, frames = adv.advect(
        g, vel, jnp.zeros((4, 3), jnp.float32), 0.0, acfg
    )
    assert frames.shape == (4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(frames[-1]), np.asarray(final), atol=0
    )
    # frames advance monotonically in x (far from the wrap)
    xs = np.asarray(frames[:, 0, 0])
    assert np.all(np.diff(xs) > 0)


# ---------------------------------------------------------------- sharded


def test_advect_sharded_matches_single_and_has_no_collectives():
    from jax.sharding import Mesh

    g = _grid(periodic=True)
    cfg = MLPGridConfig()
    params = mlp.init_params(cfg.dims, seed=11, scale=0.3)
    vel = adv.velocity_fn_from_model(g, cfg, params)
    acfg = adv.AdvectConfig(steps=15, dt=1e-2, method="rk2")
    rng = np.random.default_rng(4)
    pts0 = jnp.asarray(
        rng.uniform(0, [g.nx, g.ny, g.nz], size=(16, 3)).astype(np.float32)
    )
    single = jax.jit(lambda p: adv.advect(g, vel, p, 0.1, acfg))(pts0)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("p",))
    sharded = adv.advect_sharded(g, vel, pts0, 0.1, acfg, mesh)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
    # data parallelism over particles needs zero communication: the
    # compiled partitioned module must contain no collective ops
    from jax.sharding import NamedSharding, PartitionSpec as PS

    pts_sh = jax.device_put(pts0, NamedSharding(mesh, PS("p")))
    hlo = (
        jax.jit(lambda p: adv.advect(g, vel, p, 0.1, acfg))
        .lower(pts_sh)
        .compile()
        .as_text()
    )
    for op in ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all"):
        assert op not in hlo, f"unexpected {op} in sharded advect HLO"


def test_model_velocity_periodic_seam_band_stays_in_domain():
    """Periodic index space has period n but the model's domain ends at
    u=1 (index n-1). Indices in the seam band (n-1, n) must evaluate the
    model AT the u=1 face (clamped), never extrapolate past it — hash
    encoders would alias out of range (review finding, session 3)."""
    g = _grid(periodic=True)
    cfg = MLPGridConfig()
    params = mlp.init_params(cfg.dims, seed=21, scale=0.4)
    vel = adv.velocity_fn_from_model(g, cfg, params)
    band = jnp.asarray([[g.nx - 0.5, 1.0, 1.0]], jnp.float32)
    v_band = vel(band, 0.2)
    face = jnp.asarray(
        [[1.0, 1.0 / (g.ny - 1), 1.0 / (g.nz - 1)]], jnp.float32
    )
    v_face = sample.mlp_eval_points(cfg, params, face, 0.2)[..., 1:4]
    np.testing.assert_array_equal(np.asarray(v_band), np.asarray(v_face))
    # NGP arm: the same band query must not alias the hash lattice
    ncfg = ngp.NGPFieldConfig()
    nparams = ngp.init_ngp_params(ncfg, seed=2)
    vel_n = adv.velocity_fn_from_model(g, ncfg, nparams)
    v_n = vel_n(band, 0.2)
    v_n_face = sample.ngp_eval_points(
        ncfg, nparams, face, 0.2
    )[..., 1:4]
    np.testing.assert_array_equal(np.asarray(v_n), np.asarray(v_n_face))


def test_mlp_points_bf16_tier_tracks_f32():
    cfg = MLPGridConfig()
    params = mlp.init_params(cfg.dims, seed=17, scale=0.4)
    rng = np.random.default_rng(8)
    pts = jnp.asarray(rng.uniform(0, 1, size=(256, 3)).astype(np.float32))
    f32 = sample.mlp_eval_points(cfg, params, pts, 0.3)
    b16 = sample.mlp_eval_points(cfg, params, pts, 0.3, precision="bf16")
    scale = float(jnp.max(jnp.abs(f32))) + 1e-6
    err = float(jnp.max(jnp.abs(b16 - f32))) / scale
    assert err <= 2e-2, err  # bf16 operand tier: 1e-3..1e-2 class
    assert err > 0.0  # and it really is the reduced-precision path
    # NGP family refuses the tier rather than silently serving f32
    ncfg = ngp.NGPFieldConfig()
    nparams = ngp.init_ngp_params(ncfg, seed=3)
    with pytest.raises(ValueError, match="bf16 point serving"):
        sample.evaluate_points(ncfg, nparams, pts, 0.3, precision="bf16")
