"""Tests for apps/transport.py (gather-free semi-Lagrangian advection).

Oracles: exact integer-cell shifts, constant-offset equality with the
gather-based trilinear sampler, the discrete max principle, and analytic
multi-step translation."""

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.apps import transport as tr
from phys_autodiff_tpu.models import sample
from phys_autodiff_tpu.ops.stencil import shift
from phys_autodiff_tpu.utils.config import GridSpec


def _grid(periodic=True, nx=8, ny=6, nz=5):
    return GridSpec(nx=nx, ny=ny, nz=nz, hx=0.5, hy=0.25, hz=0.125,
                    dt=1e-3, periodic=periodic)


def _rand_sigma(g, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=g.shape).astype(np.float32))


def _const_u(g, ux, uy, uz):
    return jnp.broadcast_to(
        jnp.asarray([ux, uy, uz], jnp.float32)[:, None, None, None],
        (3,) + g.shape,
    )


def test_zero_velocity_is_identity():
    g = _grid()
    sigma = _rand_sigma(g)
    out = tr.transport_step(g, sigma, _const_u(g, 0, 0, 0), g.dt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sigma))


def test_integer_cell_shift_is_exact():
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 1)
    # u dt / h = exactly one cell along each axis
    dt = 0.01
    u = _const_u(g, g.hx / dt, g.hy / dt, g.hz / dt)
    out = tr.transport_step(g, sigma, u, dt)
    expect = shift(shift(shift(sigma, -1, 2, True), -1, 1, True), -1, 0, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=0, atol=1e-6
    )


def test_constant_offset_matches_gather_trilinear():
    # for constant u the split sweeps ARE trilinear interpolation at the
    # departure points — compare against the gather-based sampler
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 2)
    dt = 0.01
    u = _const_u(g, 0.37 * g.hx / dt, -0.61 * g.hy / dt, 0.25 * g.hz / dt)
    out = tr.transport_step(g, sigma, u, dt)
    iz, iy, ix = np.meshgrid(
        np.arange(g.nz), np.arange(g.ny), np.arange(g.nx), indexing="ij"
    )
    dep = jnp.asarray(
        np.stack(
            [ix.ravel() - 0.37, iy.ravel() + 0.61, iz.ravel() - 0.25],
            axis=-1,
        ).astype(np.float32)
    )
    expect = sample.trilinear_sample(sigma, dep, g)
    np.testing.assert_allclose(
        np.asarray(out).ravel(), np.asarray(expect), rtol=2e-6, atol=2e-6
    )


def test_max_principle_random_velocity():
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 3)
    rng = np.random.default_rng(4)
    # CFL ~ 0.9 random velocity
    u = jnp.asarray(
        (rng.uniform(-0.9, 0.9, size=(3,) + g.shape)
         * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / 0.01
         ).astype(np.float32)
    )
    out = np.asarray(tr.transport_step(g, sigma, u, 0.01))
    assert out.min() >= float(jnp.min(sigma)) - 1e-6
    assert out.max() <= float(jnp.max(sigma)) + 1e-6


def test_multi_step_translation_analytic():
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 5)
    dt = 0.01
    u = _const_u(g, 0.5 * g.hx / dt, 0.0, 0.0)  # half a cell per step in x
    out, cfl = jax.jit(
        lambda s: tr.transport(
            g, s, u, tr.TransportConfig(dt=dt, steps=2)
        )
    )(sigma)
    assert float(cfl) <= 1.0 + 1e-6
    # two half-cell steps: first produces averages of neighbors, second
    # shifts again — equals trilinear at a half-cell offset applied twice,
    # NOT one full-cell shift (interpolation diffuses); verify against the
    # step-by-step oracle
    o1 = tr.transport_step(g, sigma, u, dt)
    o2 = tr.transport_step(g, o1, u, dt)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(o2), rtol=0, atol=1e-6
    )


def test_cfl_clip_keeps_step_bounded():
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 6)
    # wildly super-CFL velocity: offsets clip to one cell, result stays a
    # convex combination (max principle) and max_cfl reports the violation
    u = _const_u(g, 100.0, -100.0, 100.0)
    out = np.asarray(tr.transport_step(g, sigma, u, 1.0))
    assert out.min() >= float(jnp.min(sigma)) - 1e-6
    assert out.max() <= float(jnp.max(sigma)) + 1e-6
    assert float(tr.max_cfl(g, u, 1.0)) > 1.0


def test_clamp_boundary_mode():
    g = _grid(periodic=False)
    sigma = _rand_sigma(g, 7)
    u = _const_u(g, 0.4 * g.hx / 0.01, 0.0, 0.0)
    out = np.asarray(tr.transport_step(g, sigma, u, 0.01))
    # inflow face (x=0) departure clamps to the edge value mix of itself
    s = np.asarray(sigma)
    expect_edge = s[:, :, 0] + 0.4 * (s[:, :, 0] - s[:, :, 0])
    np.testing.assert_allclose(out[:, :, 0], expect_edge, atol=1e-6)


def test_time_dependent_matches_frozen_for_constant_source():
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 8)
    dt = 0.01
    u = _const_u(g, 0.3 * g.hx / dt, 0.1 * g.hy / dt, 0.0)
    cfg = tr.TransportConfig(dt=dt, steps=3)
    frozen, _ = tr.transport(g, sigma, u, cfg)
    timed, cfl = tr.transport_time_dependent(
        g, sigma, lambda t: u, 0.0, cfg
    )
    np.testing.assert_array_equal(np.asarray(frozen), np.asarray(timed))
    assert float(cfl) <= 1.0


def test_transport_sharded_matches_single_bitwise():
    from jax.sharding import Mesh

    for periodic in (True, False):
        g = GridSpec(nx=8, ny=6, nz=16, hx=0.5, hy=0.25, hz=0.125,
                     dt=1e-3, periodic=periodic)
        rng = np.random.default_rng(9 + periodic)
        sigma = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
        u = jnp.asarray(
            (rng.uniform(-0.9, 0.9, size=(3,) + g.shape)
             * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / 0.01
             ).astype(np.float32)
        )
        cfg = tr.TransportConfig(dt=0.01, steps=5)
        single, cfl_s = jax.jit(
            lambda s, v: tr.transport(g, s, v, cfg)
        )(sigma, u)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("z",))
        sharded, cfl_m = tr.transport_sharded(g, sigma, u, cfg, mesh)
        np.testing.assert_array_equal(
            np.asarray(sharded), np.asarray(single)
        )
        np.testing.assert_allclose(float(cfl_s), float(cfl_m), rtol=1e-6)


def test_time_dependent_from_trained_model_shapes_and_bounds():
    from phys_autodiff_tpu.models import mlp
    from phys_autodiff_tpu.utils.config import MLPDims, MLPGridConfig

    g = _grid(periodic=True)
    cfg = MLPGridConfig(dims=MLPDims(H=16))
    params = mlp.init_params(cfg.dims, seed=13, scale=0.2)
    vel_at = tr.velocity_grid_fn_from_model(g, cfg, params)
    u0 = vel_at(0.25)
    assert u0.shape == (3,) + g.shape
    sigma = _rand_sigma(g, 10)
    out, cfl = jax.jit(
        lambda s: tr.transport_time_dependent(
            g, s, vel_at, 0.25, tr.TransportConfig(dt=1e-3, steps=3)
        )
    )(sigma)
    assert bool(jnp.all(jnp.isfinite(out)))
    # monotone interpolation preserves the max principle per step
    assert float(jnp.max(out)) <= float(jnp.max(sigma)) + 1e-6
    assert float(jnp.min(out)) >= float(jnp.min(sigma)) - 1e-6


# ---------------------------------------------------------------------------
# MacCormack (second-order limited) scheme


def test_maccormack_zero_velocity_is_identity():
    g = _grid()
    sigma = _rand_sigma(g, 11)
    out = tr.maccormack_step(g, sigma, _const_u(g, 0, 0, 0), g.dt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sigma))


def test_maccormack_integer_shift_is_exact():
    # exact one-cell offsets: fwd is an exact shift, bwd inverts it, the
    # correction vanishes and the limiter is inactive
    g = _grid(periodic=True)
    sigma = _rand_sigma(g, 12)
    dt = 0.01
    u = _const_u(g, g.hx / dt, g.hy / dt, g.hz / dt)
    out = tr.maccormack_step(g, sigma, u, dt)
    expect = shift(shift(shift(sigma, -1, 2, True), -1, 1, True), -1, 0, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=0, atol=1e-6
    )


def test_maccormack_beats_first_order_on_smooth_translation():
    # smooth periodic profile, constant sub-cell velocity: after K steps
    # compare both schemes against the analytic translation — the
    # second-order corrected scheme must cut the first-order scheme's
    # dissipation error by a large factor
    g = GridSpec(nx=64, ny=8, nz=4, hx=1.0, hy=1.0, hz=1.0,
                 dt=1e-3, periodic=True)
    x = np.arange(g.nx)
    prof = np.sin(2 * np.pi * x / g.nx).astype(np.float32)
    sigma = jnp.asarray(np.broadcast_to(prof, g.shape).copy())
    dt, steps, off = 0.01, 16, 0.4  # 0.4 cells per step
    u = _const_u(g, off * g.hx / dt, 0.0, 0.0)
    exact = jnp.asarray(np.broadcast_to(
        np.sin(2 * np.pi * (x - off * steps) / g.nx).astype(np.float32),
        g.shape,
    ).copy())
    sl, _ = tr.transport(g, sigma, u, tr.TransportConfig(dt=dt, steps=steps))
    mc, _ = tr.transport(
        g, sigma, u,
        tr.TransportConfig(dt=dt, steps=steps, scheme="maccormack"),
    )
    err_sl = float(jnp.linalg.norm(sl - exact))
    err_mc = float(jnp.linalg.norm(mc - exact))
    assert err_mc < 0.35 * err_sl, (err_mc, err_sl)


def test_maccormack_limiter_restores_max_principle():
    # a 0/1 front advected at a sub-cell offset: the raw MacCormack
    # correction rings at the discontinuity (overshoots the data range);
    # the ring-bounds clamp restores the discrete max principle exactly
    g = GridSpec(nx=32, ny=8, nz=4, hx=1.0, hy=1.0, hz=1.0,
                 dt=1e-3, periodic=True)
    prof = (np.arange(g.nx) < g.nx // 2).astype(np.float32)
    sigma = jnp.asarray(np.broadcast_to(prof, g.shape).copy())
    dt = 0.01
    u = _const_u(g, 0.5 * g.hx / dt, 0.0, 0.0)
    raw = sigma
    lim = sigma
    for _ in range(4):
        raw = tr.maccormack_step(g, raw, u, dt, limit=False)
        lim = tr.maccormack_step(g, lim, u, dt, limit=True)
    assert float(jnp.max(raw)) > 1.0 + 1e-4 or float(jnp.min(raw)) < -1e-4
    assert float(jnp.max(lim)) <= 1.0 + 1e-6
    assert float(jnp.min(lim)) >= -1e-6


def test_maccormack_sharded_matches_single_bitwise():
    from jax.sharding import Mesh

    for periodic in (True, False):
        g = GridSpec(nx=8, ny=6, nz=16, hx=0.5, hy=0.25, hz=0.125,
                     dt=1e-3, periodic=periodic)
        rng = np.random.default_rng(21 + periodic)
        sigma = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
        u = jnp.asarray(
            (rng.uniform(-0.9, 0.9, size=(3,) + g.shape)
             * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / 0.01
             ).astype(np.float32)
        )
        cfg = tr.TransportConfig(dt=0.01, steps=4, scheme="maccormack")
        single, _ = jax.jit(
            lambda s, v: tr.transport(g, s, v, cfg)
        )(sigma, u)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("z",))
        sharded, _ = tr.transport_sharded(g, sigma, u, cfg, mesh)
        np.testing.assert_array_equal(
            np.asarray(sharded), np.asarray(single)
        )


def test_batched_steps_bitwise_equal_per_component():
    # transport_step_many / maccormack_step_many on a [C, ...] batch must
    # reproduce C single-field steps BITWISE (same arithmetic, shared
    # offsets) — the Euler stepper's fast self-advection path rests on it
    for periodic in (True, False):
        g = _grid(periodic=periodic)
        rng = np.random.default_rng(40 + periodic)
        fields = jnp.asarray(
            rng.normal(size=(3,) + g.shape).astype(np.float32))
        u = jnp.asarray(
            (rng.uniform(-0.9, 0.9, size=(3,) + g.shape)
             * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / 0.01
             ).astype(np.float32))
        many_sl = tr.transport_step_many(g, fields, u, 0.01)
        many_mc = tr.maccormack_step_many(g, fields, u, 0.01)
        for c in range(3):
            np.testing.assert_array_equal(
                np.asarray(many_sl[c]),
                np.asarray(tr.transport_step(g, fields[c], u, 0.01)))
            np.testing.assert_array_equal(
                np.asarray(many_mc[c]),
                np.asarray(tr.maccormack_step(g, fields[c], u, 0.01)))


def test_bf16_tier_matches_f32_step():
    """transport_step_bf16: bf16 output dtype, 1e-2-class agreement with
    the f32 step, and the max principle to bf16 rounding (each sweep is a
    convex combination in bf16)."""
    g = _grid(nx=16, ny=12, nz=10)
    rng = np.random.default_rng(3)
    sigma = jnp.asarray(rng.uniform(size=g.shape).astype(np.float32))
    u = jnp.asarray(
        (0.4 * rng.normal(size=(3,) + g.shape)).astype(np.float32))
    dt = 0.1
    ref = tr.transport_step(g, sigma, u, dt)
    out = tr.transport_step_bf16(g, sigma, u, dt)
    assert out.dtype == jnp.bfloat16
    err = float(jnp.linalg.norm(out.astype(jnp.float32) - ref)
                / jnp.linalg.norm(ref))
    assert err < 2e-2, err
    # max principle to bf16 rounding
    tol = 4e-3 * float(jnp.max(jnp.abs(sigma)))
    assert float(jnp.max(out.astype(jnp.float32))) <= float(jnp.max(sigma)) + tol
    assert float(jnp.min(out.astype(jnp.float32))) >= float(jnp.min(sigma)) - tol


def test_bf16_tier_exact_for_zero_velocity():
    """Zero offsets must reproduce sigma exactly (bf16 cast only)."""
    g = _grid()
    sigma = _rand_sigma(g, 5)
    out = tr.transport_step_bf16(g, sigma, jnp.zeros((3,) + g.shape), 0.05)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(sigma.astype(jnp.bfloat16)))
