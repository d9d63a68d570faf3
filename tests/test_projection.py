"""Tests for ops/projection.py (divergence-free projection).

The contract is DISCRETE: after projection, ops.diagnostics.divergence —
the residual operator's own central-difference div — must be ~0, to float
rounding for the FFT path and by a pinned reduction factor for the
clamp-mode iterative path. The vector-potential parameterization must be
divergence-free to rounding in BOTH boundary modes (operator identity)."""

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.ops import projection as proj
from phys_autodiff_tpu.ops.diagnostics import divergence
from phys_autodiff_tpu.utils.config import GridSpec


def _grid(periodic=True, nx=16, ny=12, nz=10):
    return GridSpec(nx=nx, ny=ny, nz=nz, hx=0.5, hy=0.25, hz=0.4,
                    dt=1e-3, periodic=periodic)


def _rand_u(g, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(3,) + g.shape).astype(np.float32) * scale
    )


def _smooth_u(g, seed=0):
    """Band-limited velocity: a few low sine modes per component (the
    smooth case the clamp-mode iterative solver is expected to handle)."""
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(
        np.arange(g.nz), np.arange(g.ny), np.arange(g.nx), indexing="ij"
    )
    comps = []
    for _ in range(3):
        f = np.zeros(g.shape)
        for _m in range(3):
            kx, ky, kz = rng.integers(1, 3, size=3)
            ph = rng.uniform(0, 2 * np.pi, size=3)
            f += (
                np.sin(2 * np.pi * kx * x / g.nx + ph[0])
                * np.sin(2 * np.pi * ky * y / g.ny + ph[1])
                * np.sin(2 * np.pi * kz * z / g.nz + ph[2])
            )
        comps.append(f.astype(np.float32))
    return jnp.asarray(np.stack(comps))


def test_fft_projection_kills_divergence_to_rounding():
    g = _grid()
    u = _rand_u(g, 1)
    before = float(jnp.max(jnp.abs(divergence(g, u))))
    out = jax.jit(lambda v: proj.project_fft(g, v))(u)
    after = float(jnp.max(jnp.abs(divergence(g, out))))
    assert before > 1.0  # the random field is definitely not solenoidal
    assert after <= 2e-5 * before, (before, after)


def test_fft_projection_is_idempotent():
    g = _grid()
    u = _rand_u(g, 2)
    p1 = proj.project_fft(g, u)
    p2 = proj.project_fft(g, p1)
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(p1), rtol=0, atol=2e-6
    )


def test_fft_projection_preserves_solenoidal_fields():
    g = _grid()
    A = _rand_u(g, 3)
    u = proj.velocity_from_potential(g, A)  # exactly solenoidal
    out = proj.project_fft(g, u)
    scale = float(jnp.max(jnp.abs(u)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(u), rtol=0, atol=2e-5 * scale
    )


def test_fft_projection_annihilates_gradient_fields():
    g = _grid()
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    u = proj.grad(g, p)  # pure gradient — entirely in the removed subspace
    out = proj.project_fft(g, u)
    scale = float(jnp.max(jnp.abs(u)))
    assert float(jnp.max(jnp.abs(out))) <= 2e-5 * scale


def test_vector_potential_divfree_both_boundary_modes():
    for periodic in (True, False):
        g = _grid(periodic=periodic)
        A = _rand_u(g, 5)
        u = proj.velocity_from_potential(g, A)
        scale = float(jnp.max(jnp.abs(u))) + 1e-30
        d = float(jnp.max(jnp.abs(divergence(g, u))))
        assert d <= 1e-5 * scale, (periodic, d, scale)


def test_cg_projection_reduces_divergence_clamp():
    g = _grid(periodic=False)
    u = _smooth_u(g, 6)
    before = float(jnp.max(jnp.abs(divergence(g, u))))
    out = jax.jit(lambda v: proj.project_cg(g, v, maxiter=300))(u)
    after = float(jnp.max(jnp.abs(divergence(g, out))))
    assert after <= before / 30.0, (before, after)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_project_dispatch_routes_by_boundary():
    gp = _grid(periodic=True)
    up = _rand_u(gp, 7)
    np.testing.assert_array_equal(
        np.asarray(proj.project(gp, up)),
        np.asarray(proj.project_fft(gp, up)),
    )
    gc = _grid(periodic=False)
    uc = _smooth_u(gc, 8)
    np.testing.assert_array_equal(
        np.asarray(proj.project(gc, uc)),
        np.asarray(proj.project_cg(gc, uc)),
    )


def test_fft_projection_is_differentiable():
    g = _grid()
    u = _rand_u(g, 9)

    def f(v):
        out = proj.project_fft(g, v)
        return jnp.sum(out * out)

    gr = jax.grad(f)(u)
    assert gr.shape == u.shape
    assert bool(jnp.all(jnp.isfinite(gr)))
    # the projector is linear + self-adjoint, so grad = 2 * project(u)
    np.testing.assert_allclose(
        np.asarray(gr),
        2.0 * np.asarray(proj.project_fft(g, u)),
        rtol=0,
        atol=3e-5,
    )
