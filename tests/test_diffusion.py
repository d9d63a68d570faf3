"""Tests for ops/diffusion.py (implicit compact-Laplacian diffusion).

Oracles: the exact per-mode decay factor 1/(1 + c dt lambda_k) on a single
Fourier mode (lambda_k = 4 sum_a sin^2(pi k_a/n_a)/h_a^2 is the compact
symbol), operator symmetry under clamp (the SPD claim CG rests on),
CG == FFT on periodic grids, exact mean conservation, the max principle,
and dissipativity. Plus the Euler integration: viscosity strictly
accelerates kinetic-energy decay and leaves the projection's divergence
at rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.apps import euler
from phys_autodiff_tpu.ops import diffusion
from phys_autodiff_tpu.utils.config import GridSpec


def _grid(periodic=True, nx=16, ny=12, nz=10):
    return GridSpec(nx=nx, ny=ny, nz=nz, hx=0.5, hy=0.25, hz=0.4,
                    dt=1e-3, periodic=periodic)


def _rand(g, seed=0, shape_prefix=()):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=shape_prefix + g.shape).astype(np.float32)
    )


def test_fft_single_mode_exact_decay():
    g = _grid()
    kx, ky, kz = 3, 2, 1
    z, y, x = np.meshgrid(
        np.arange(g.nz), np.arange(g.ny), np.arange(g.nx), indexing="ij"
    )
    f = np.cos(
        2 * np.pi * (kx * x / g.nx + ky * y / g.ny + kz * z / g.nz)
    ).astype(np.float32)
    c, dt = 0.7, 0.3
    lam = 4 * (
        np.sin(np.pi * kx / g.nx) ** 2 / g.hx**2
        + np.sin(np.pi * ky / g.ny) ** 2 / g.hy**2
        + np.sin(np.pi * kz / g.nz) ** 2 / g.hz**2
    )
    out = jax.jit(
        lambda v: diffusion.diffuse_fft(g, v, c, dt)
    )(jnp.asarray(f))
    np.testing.assert_allclose(
        np.asarray(out), f / (1.0 + c * dt * lam), rtol=0, atol=1e-5
    )


def test_mean_conserved_exactly():
    for periodic in (True, False):
        g = _grid(periodic)
        f = _rand(g, 1)
        out = jax.jit(
            lambda v: diffusion.diffuse(g, v, 0.9, 0.2, maxiter=200)
        )(f)
        np.testing.assert_allclose(
            float(jnp.mean(out)), float(jnp.mean(f)), rtol=0, atol=1e-6
        )


def test_cg_matches_fft_on_periodic():
    g = _grid(True)
    f = _rand(g, 2)
    a = jax.jit(lambda v: diffusion.diffuse_fft(g, v, 0.5, 0.1))(f)
    b = jax.jit(
        lambda v: diffusion.diffuse_cg(g, v, 0.5, 0.1, maxiter=300, tol=1e-9)
    )(f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_clamped_laplacian_is_symmetric():
    g = _grid(False, nx=8, ny=6, nz=5)
    f, h = _rand(g, 3), _rand(g, 4)
    lf = diffusion.laplacian(g, f)
    lh = diffusion.laplacian(g, h)
    a = float(jnp.sum(lf * h))
    b = float(jnp.sum(f * lh))
    assert abs(a - b) <= 1e-3 * max(abs(a), abs(b), 1e-30), (a, b)


def test_cg_solves_the_clamped_system():
    g = _grid(False)
    f = _rand(g, 5)
    c, dt = 0.8, 0.15
    out = jax.jit(
        lambda v: diffusion.diffuse_cg(g, v, c, dt, maxiter=300, tol=1e-8)
    )(f)
    resid = out - c * dt * diffusion.laplacian(g, out) - f
    rel = float(jnp.linalg.norm(resid)) / float(jnp.linalg.norm(f))
    assert rel <= 1e-5, rel


def test_max_principle_and_dissipativity():
    for periodic in (True, False):
        g = _grid(periodic)
        f = _rand(g, 6)
        out = jax.jit(
            lambda v: diffusion.diffuse(g, v, 1.3, 0.4, maxiter=300)
        )(f)
        assert float(jnp.max(out)) <= float(jnp.max(f)) + 1e-5
        assert float(jnp.min(out)) >= float(jnp.min(f)) - 1e-5
        # variance strictly drops (f is rough)
        assert float(jnp.var(out)) < 0.9 * float(jnp.var(f))


def test_vector_field_broadcasts():
    g = _grid()
    u = _rand(g, 7, shape_prefix=(3,))
    out = jax.jit(lambda v: diffusion.diffuse_fft(g, v, 0.2, 0.1))(u)
    ref = jnp.stack(
        [diffusion.diffuse_fft(g, u[c], 0.2, 0.1) for c in range(3)]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_euler_viscosity_accelerates_energy_decay():
    g = _grid()
    rng = np.random.default_rng(8)
    u0 = jnp.asarray(rng.normal(size=(3,) + g.shape).astype(np.float32))
    s0 = jnp.asarray(rng.uniform(size=g.shape).astype(np.float32))
    state0 = euler.EulerState(s0, u0)
    base = euler.EulerConfig(dt=0.05, steps=4)
    visc = euler.EulerConfig(dt=0.05, steps=4, viscosity=0.5,
                             diffusivity=0.1)
    _, d0 = jax.jit(lambda s: euler.rollout(g, s, base))(state0)
    fv, dv = jax.jit(lambda s: euler.rollout(g, s, visc))(state0)
    assert float(dv["kinetic_energy"][-1]) < float(d0["kinetic_energy"][-1])
    # viscous step still ends solenoidal (diffuse happens pre-projection)
    umax = float(jnp.max(jnp.abs(fv.u))) + 1e-30
    assert float(jnp.max(dv["max_abs_div"])) <= 1e-4 * max(umax, 1.0)
    # scalar diffusion respects the max principle
    assert float(jnp.max(fv.sigma)) <= float(jnp.max(s0)) + 1e-5
    assert float(jnp.min(fv.sigma)) >= float(jnp.min(s0)) - 1e-5


def test_diffusion_is_differentiable():
    g = _grid()
    f = _rand(g, 9)

    def loss(v):
        return jnp.sum(diffusion.diffuse_fft(g, v, 0.3, 0.2) ** 2)

    grad = jax.jit(jax.grad(loss))(f)
    assert bool(jnp.all(jnp.isfinite(grad)))
    assert float(jnp.linalg.norm(grad)) > 0.0
