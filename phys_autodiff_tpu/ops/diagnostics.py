"""Field diagnostics: divergence, curl (vorticity), and kinetic energy.

Physics users inspect these constantly (the reference's own richer test
field is chosen divergence-free — test/test_phys_cuda_fused_vs_nonfused
.cpp:30-51 — but the reference provides no operator to CHECK that). Built
from the same shift/central_diff primitives as the residual stencil, so
the boundary semantics (periodic wrap / clamp with the degenerate edge
difference) are identical by construction, and everything fuses under jit
and differentiates under jax.grad.

Layouts follow the framework contract: u is channel-major [3, nz, ny, nx]
(components ux, uy, uz); axes inside a component are (z, y, x).
"""

from __future__ import annotations

import jax.numpy as jnp

from phys_autodiff_tpu.ops.stencil import central_diff, inv2h_f32
from phys_autodiff_tpu.utils.config import GridSpec

# component axes within one [nz, ny, nx] field
_AX_Z, _AX_Y, _AX_X = 0, 1, 2


def divergence(g: GridSpec, u: jnp.ndarray) -> jnp.ndarray:
    """div u = dux/dx + duy/dy + duz/dz, central differences: [nz, ny, nx].

    Identical arithmetic to the div-u term inside the residual operator
    (reference: src/phys_cpu.cpp:96-101), exposed standalone."""
    assert u.shape[0] == 3, u.shape
    per = g.periodic
    return (
        central_diff(u[0], _AX_X, inv2h_f32(g.hx), per)
        + central_diff(u[1], _AX_Y, inv2h_f32(g.hy), per)
        + central_diff(u[2], _AX_Z, inv2h_f32(g.hz), per)
    )


def curl(g: GridSpec, u: jnp.ndarray) -> jnp.ndarray:
    """Vorticity w = curl u, channel-major [3, nz, ny, nx]:

        w_x = duz/dy - duy/dz
        w_y = dux/dz - duz/dx
        w_z = duy/dx - dux/dy
    """
    assert u.shape[0] == 3, u.shape
    per = g.periodic
    ix, iy, iz = inv2h_f32(g.hx), inv2h_f32(g.hy), inv2h_f32(g.hz)
    wx = central_diff(u[2], _AX_Y, iy, per) - central_diff(u[1], _AX_Z, iz, per)
    wy = central_diff(u[0], _AX_Z, iz, per) - central_diff(u[2], _AX_X, ix, per)
    wz = central_diff(u[1], _AX_X, ix, per) - central_diff(u[0], _AX_Y, iy, per)
    return jnp.stack([wx, wy, wz])


def kinetic_energy(u: jnp.ndarray) -> jnp.ndarray:
    """Mean kinetic energy density 0.5 * mean(|u|^2) (unit density)."""
    assert u.shape[0] == 3, u.shape
    return 0.5 * jnp.mean(jnp.sum(u * u, axis=0))


def field_stats(g: GridSpec, sigma: jnp.ndarray, u: jnp.ndarray) -> dict:
    """One-call health summary of a field snapshot (all scalars, jit-safe):
    sigma/u extrema, mean kinetic energy, max |div u|, max |curl u|."""
    d = divergence(g, u)
    w = curl(g, u)
    return {
        "sigma_min": jnp.min(sigma),
        "sigma_max": jnp.max(sigma),
        "u_max_abs": jnp.max(jnp.abs(u)),
        "kinetic_energy": kinetic_energy(u),
        "div_max_abs": jnp.max(jnp.abs(d)),
        "curl_max_abs": jnp.max(jnp.abs(w)),
    }
