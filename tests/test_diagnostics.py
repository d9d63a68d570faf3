"""Tests for ops/diagnostics.py (divergence, curl, stats) against exact
discrete oracles, plus models/sample.evaluate_points_batched chunking."""

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.models import mlp, ngp, sample
from phys_autodiff_tpu.ops import diagnostics
from phys_autodiff_tpu.utils.config import GridSpec, MLPGridConfig


def _mesh(g):
    z, y, x = jnp.meshgrid(
        jnp.arange(g.nz, dtype=jnp.float32) * g.hz,
        jnp.arange(g.ny, dtype=jnp.float32) * g.hy,
        jnp.arange(g.nx, dtype=jnp.float32) * g.hx,
        indexing="ij",
    )
    return z, y, x


def test_divergence_free_reference_field_is_exactly_zero():
    # the reference's richer test field u = (sin z, cos x, sin y)
    # (test_phys_cuda_fused_vs_nonfused.cpp:30-51): each component is
    # constant along its OWN axis, so the discrete central difference of
    # every div term is identically zero — not just small
    L = 2 * np.pi
    n = 16
    g = GridSpec(nx=n, ny=n, nz=n, hx=L / n, hy=L / n, hz=L / n, dt=1e-3,
                 periodic=True)
    z, y, x = _mesh(g)
    u = jnp.stack([jnp.sin(z), jnp.cos(x), jnp.sin(y)])
    d = diagnostics.divergence(g, u)
    assert float(jnp.max(jnp.abs(d))) == 0.0


def test_divergence_linear_field_exact_interior():
    g = GridSpec(nx=8, ny=7, nz=6, hx=0.3, hy=0.5, hz=0.7, dt=1e-3,
                 periodic=False)
    z, y, x = _mesh(g)
    a, b, c = 1.5, -2.0, 0.25
    u = jnp.stack([a * x, b * y, c * z])
    d = np.asarray(diagnostics.divergence(g, u))
    # clamp edges degenerate to one-sided/2 — exact only in the interior
    interior = d[1:-1, 1:-1, 1:-1]
    np.testing.assert_allclose(interior, a + b + c, rtol=1e-5)


def test_curl_linear_shear_exact_interior():
    g = GridSpec(nx=8, ny=8, nz=8, hx=0.4, hy=0.4, hz=0.4, dt=1e-3,
                 periodic=False)
    z, y, x = _mesh(g)
    # u = (0, 0, x): curl = (0, -1, 0); u = (y, 0, 0) adds w_z = -1
    u = jnp.stack([y, jnp.zeros_like(x), x])
    w = np.asarray(diagnostics.curl(g, u))[:, 1:-1, 1:-1, 1:-1]
    np.testing.assert_allclose(w[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[1], -1.0, rtol=1e-5)
    np.testing.assert_allclose(w[2], -1.0, rtol=1e-5)


def test_curl_of_gradient_field_vanishes_periodic():
    # u = grad(phi) for phi = sin(x+y+z) on a periodic box: the discrete
    # curl of a discrete gradient of shifted copies still cancels exactly
    # because central differences along different axes commute
    L = 2 * np.pi
    n = 12
    g = GridSpec(nx=n, ny=n, nz=n, hx=L / n, hy=L / n, hz=L / n, dt=1e-3,
                 periodic=True)
    z, y, x = _mesh(g)
    phi = jnp.sin(x + y + z)
    from phys_autodiff_tpu.ops.stencil import central_diff

    u = jnp.stack([
        central_diff(phi, 2, 0.5 / g.hx, True),
        central_diff(phi, 1, 0.5 / g.hy, True),
        central_diff(phi, 0, 0.5 / g.hz, True),
    ])
    w = diagnostics.curl(g, u)
    assert float(jnp.max(jnp.abs(w))) <= 1e-7


def test_field_stats_jits_and_is_finite():
    g = GridSpec(nx=8, ny=6, nz=5, hx=0.5, hy=0.5, hz=0.5, dt=1e-3)
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(3,) + g.shape).astype(np.float32))
    stats = jax.jit(lambda s, v: diagnostics.field_stats(g, s, v))(sigma, u)
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    assert float(stats["kinetic_energy"]) > 0
    assert float(stats["sigma_min"]) <= float(stats["sigma_max"])


def test_kinetic_energy_constant_field():
    u = jnp.broadcast_to(
        jnp.asarray([3.0, 4.0, 0.0], jnp.float32)[:, None, None, None],
        (3, 2, 3, 4),
    )
    np.testing.assert_allclose(
        float(diagnostics.kinetic_energy(u)), 12.5, rtol=1e-6
    )  # 0.5 * (9 + 16)


# ---------------------------------------------------- batched point serving


def test_evaluate_points_batched_matches_unbatched_mlp():
    cfg = MLPGridConfig()
    params = mlp.init_params(cfg.dims, seed=9)
    rng = np.random.default_rng(5)
    for p in (7, 128, 301):  # below, equal-multiple, non-multiple of batch
        pts = jnp.asarray(rng.uniform(0, 1, size=(p, 3)).astype(np.float32))
        full = sample.evaluate_points(cfg, params, pts, 0.4)
        chunked = sample.evaluate_points_batched(
            cfg, params, pts, 0.4, batch_size=128
        )
        np.testing.assert_array_equal(np.asarray(chunked), np.asarray(full))


def test_evaluate_points_batched_ngp_chunks_under_guard():
    ncfg = ngp.NGPFieldConfig()
    params = ngp.init_ngp_params(ncfg, seed=1)
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.uniform(0, 1, size=(300, 3)).astype(np.float32))
    # batch_size 128: each lax.map chunk stays under the pointwise guard
    # even for point sets larger than it
    out = sample.evaluate_points_batched(
        ncfg, params, pts, 0.2, batch_size=128
    )
    full = sample.evaluate_points(ncfg, params, pts, 0.2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full), rtol=2e-6, atol=2e-6
    )
