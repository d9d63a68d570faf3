"""Solid obstacles for the Euler solver — masked no-slip + masked projection.

The reference has no integrator at all (SURVEY.md §0), so this is pure
extension surface; it completes the smoke-solver application
(`apps/euler.py`) with the one thing every practical smoke sim needs:
internal solid boundaries (a building, a sphere, a fan duct) inside the
box.

Representation: a FLUID MASK `m: [nz, ny, nx] float32 in {0, 1}` on the
cell-centered grid (1 = fluid, 0 = solid) — the voxelized-obstacle
formulation standard for collocated smoke solvers. Three surfaces:

  * mask builders (`box_mask`, `sphere_mask`, `union`/`complement`) —
    tiny numpy helpers producing static masks; anything [nz,ny,nx]-shaped
    with 0/1 values works.
  * `apply_no_slip(u, m)` — zero the velocity inside solids (broadcasts
    the mask over the channel axis). With u = 0 at a solid cell, the
    semi-Lagrangian backtrace from that cell departs from ITSELF, so
    solid-cell values are exact fixed points of the advection step — the
    no-penetration property the tests pin bitwise.
  * `project_masked(g, u, m, ...)` — the masked Helmholtz projection:
    find a pressure correction supported on fluid cells that minimizes
    the FLUID-cell divergence,

        minimize_p  || M D (u_s - M_v G p) ||^2 ,   u_s = M_v u,

    with D/G the framework's wide central-difference div/grad (the
    operators the residual stencil and `diagnostics.divergence` use),
    M the fluid-mask multiplier and M_v its channel broadcast. The
    correction field M_v G p is identically zero in solids, so no-slip
    survives the projection. Solved by CGNR exactly like `project_cg`
    (the masked operator A = M D M_v G is nonsymmetric; the normal
    equations are symmetric PSD, jax.linear_transpose supplies A^T).
    With m == 1 everywhere this degenerates to `project_cg`'s operator
    (a pinned test).

Like `project_cg`, the masked projection converges to the attainable
least-squares component — tests pin a large fluid-divergence reduction,
not exactness (the wide stencil cannot be exactly inverted against an
arbitrary voxel boundary). Cells in the two-cell boundary layer see the
obstacle through the stencil; the interior-fluid divergence is what the
solver drives to ~0.

Everything is pure jnp (masks are just multiplies — no gathers, no
dynamic shapes), jit-safe, and differentiable: `jax.grad` flows through
the masked rollout, so inverse problems "steer the smoke around the
obstacle" work unchanged (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.ops.diagnostics import divergence
from phys_autodiff_tpu.ops.projection import grad
from phys_autodiff_tpu.utils.config import GridSpec


# ----------------------------------------------------------------- masks

def box_mask(g: GridSpec, lo, hi) -> jnp.ndarray:
    """Fluid mask with a solid axis-aligned box of CELL-INDEX extents
    [lo, hi) per axis, given z-y-x order: lo=(z0,y0,x0), hi=(z1,y1,x1).
    Returns [nz, ny, nx] float32, 1 = fluid, 0 = solid."""
    m = np.ones(g.shape, np.float32)
    z0, y0, x0 = (int(v) for v in lo)
    z1, y1, x1 = (int(v) for v in hi)
    m[z0:z1, y0:y1, x0:x1] = 0.0
    return jnp.asarray(m)


def sphere_mask(g: GridSpec, center, radius: float) -> jnp.ndarray:
    """Fluid mask with a solid sphere: center (cz, cy, cx) in cell
    indices, radius in PHYSICAL units (the grid may be anisotropic)."""
    z, y, x = np.meshgrid(
        np.arange(g.nz), np.arange(g.ny), np.arange(g.nx), indexing="ij"
    )
    cz, cy, cx = center
    r2 = (
        ((z - cz) * g.hz) ** 2
        + ((y - cy) * g.hy) ** 2
        + ((x - cx) * g.hx) ** 2
    )
    return jnp.asarray((r2 > radius * radius).astype(np.float32))


def union(*masks: jnp.ndarray) -> jnp.ndarray:
    """Fluid mask of the union of the SOLIDS (intersection of fluids)."""
    out = masks[0]
    for m in masks[1:]:
        out = out * m
    return out


def complement(mask: jnp.ndarray) -> jnp.ndarray:
    """Swap fluid and solid."""
    return 1.0 - mask


def validate_mask(g: GridSpec, mask: jnp.ndarray) -> jnp.ndarray:
    """Shape/dtype/value checks (host-side; call once outside jit).

    The CLI validates every --obstacle mask through here; library callers
    of euler.rollout/euler_step should do the same on any hand-built mask
    — a non-binary mask (e.g. 0.5) would silently ATTENUATE velocity and
    density instead of modelling a solid, because no-slip is a multiply.
    Raises ValueError (not assert: survives python -O)."""
    if mask.shape != g.shape:
        raise ValueError(
            f"mask shape {mask.shape} != grid shape {g.shape}")
    m = jnp.asarray(mask, jnp.float32)
    vals = np.unique(np.asarray(m))
    if not np.all((vals == 0.0) | (vals == 1.0)):
        raise ValueError(f"mask must be 0/1, got values {vals[:8]}")
    return m


# -------------------------------------------------------------- no-slip

def apply_no_slip(u: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero the velocity inside solid cells: u * mask over the channel
    axis. u: [3, nz, ny, nx] (or [nz, ny, nx] for a scalar field)."""
    if u.ndim == mask.ndim + 1:
        return u * mask[None]
    return u * mask


# ---------------------------------------------------- masked projection

def project_masked(
    g: GridSpec,
    u: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    maxiter: int = 200,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Masked Helmholtz projection (module docstring): returns
    u_s - M_v G p with p the CGNR least-squares minimizer of the
    fluid-cell divergence. The result is identically zero in solid
    cells and divergence-reduced in fluid cells; works in both boundary
    modes (the FFT path has no masked diagonalization, so obstacles
    always take the iterative solve)."""
    assert u.shape == (3,) + g.shape, (u.shape, g.shape)
    assert mask.shape == g.shape, (mask.shape, g.shape)
    u_s = apply_no_slip(u, mask)
    d = mask * divergence(g, u_s)
    # fluid-mean removal: the constant-in-fluid mode is (near-)invisible
    # to the masked operator; removing it from the RHS keeps CGNR off the
    # incompatible component (same doctrine as project_cg's global mean).
    n_fluid = jnp.maximum(jnp.sum(mask), 1.0)
    d = mask * (d - jnp.sum(d) / n_fluid)

    def fwd(p):
        return mask * divergence(g, apply_no_slip(grad(g, p), mask))

    transpose = jax.linear_transpose(fwd, d)

    def normal_op(p):
        (atap,) = transpose(fwd(p))
        return atap

    (rhs,) = transpose(d)
    p, _ = jax.scipy.sparse.linalg.cg(
        normal_op, rhs, tol=tol, maxiter=maxiter
    )
    return u_s - apply_no_slip(grad(g, p), mask)


def fluid_divergence(g: GridSpec, u: jnp.ndarray, mask: jnp.ndarray):
    """max |div u| over INTERIOR fluid cells — fluid cells whose full
    +-1 stencil ring is also fluid (the boundary layer sees the solid
    through the wide stencil and is excluded by construction). The
    interior-fluid mask is mask eroded by one cell in each of the six
    stencil directions, with the grid's own boundary topology."""
    m = mask
    interior = m
    for axis in (0, 1, 2):
        if g.periodic:
            interior = interior * jnp.roll(m, 1, axis) * jnp.roll(m, -1, axis)
        else:
            # clamp topology: edge cells neighbor themselves
            interior = (
                interior
                * _shift_clamp(m, 1, axis)
                * _shift_clamp(m, -1, axis)
            )
    return jnp.max(jnp.abs(interior * divergence(g, u)))


def _shift_clamp(f: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """Shift with edge replication (the clamp boundary's neighbor rule)."""
    idx = np.clip(np.arange(f.shape[axis]) + off, 0, f.shape[axis] - 1)
    return jnp.take(f, jnp.asarray(idx), axis=axis)
