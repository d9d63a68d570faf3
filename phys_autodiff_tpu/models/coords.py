"""On-device grid coordinate generation.

Replicates make_grid_coords (src/mlp_grid.cpp:21-43) — including its quirks —
but as traced jnp ops (broadcasted iota) instead of a host loop, so coordinate
construction fuses into the jitted pipeline and never leaves HBM:

  * spatial: v / (n - 1) in [0, 1]; MinusOneToOne maps to 2u - 1
  * degenerate axes (n <= 1) produce coordinate 0
  * time channel: raw t for MinusOneToOne, but t + 0.5 for ZeroToOne
    (the reference's deliberate quirk at src/mlp_grid.cpp:38)

Output layout: [nz, ny, nx, 4] with channels (x, y, z, t) — C-order reshape
to [N, 4] matches the reference's coords array exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from phys_autodiff_tpu.utils.config import CoordNorm, GridSpec


def _axis_coord(n: int, norm: CoordNorm) -> jnp.ndarray:
    if n <= 1:
        return jnp.zeros((max(n, 1),), dtype=jnp.float32)
    u = jnp.arange(n, dtype=jnp.float32) / jnp.float32(n - 1)
    if norm == CoordNorm.MinusOneToOne:
        return 2.0 * u - 1.0
    return u


def grid_coords(g: GridSpec, t, norm: CoordNorm = CoordNorm.MinusOneToOne):
    """Coordinates [nz, ny, nx, 4]. `t` may be a Python float or a traced
    scalar (so field generation at t-dt/t/t+dt stays inside one jit)."""
    cx = _axis_coord(g.nx, norm)
    cy = _axis_coord(g.ny, norm)
    cz = _axis_coord(g.nz, norm)
    shape = g.shape
    xs = jnp.broadcast_to(cx[None, None, :], shape)
    ys = jnp.broadcast_to(cy[None, :, None], shape)
    zs = jnp.broadcast_to(cz[:, None, None], shape)
    t_val = jnp.float32(t) if norm == CoordNorm.MinusOneToOne else jnp.float32(t) + 0.5
    ts = jnp.broadcast_to(t_val, shape)
    return jnp.stack([xs, ys, zs, ts], axis=-1)
