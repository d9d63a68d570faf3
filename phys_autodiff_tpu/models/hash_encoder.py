"""Multiresolution hash encoding (Instant-NGP style) — framework extension.

The reference has NO hash grid (SURVEY.md §0: its "mlp_grid" is a dense
coordinate MLP), but the project's north star frames it as an NGP-style
system, and the retrieved papers (PAPERS.md: Instant-NGP, hash-encoded
PINNs) point this way. This module adds the encoder as an extension on top
of the same field-generation API, so the physics loss can train either the
plain coordinate MLP or a hash-encoded field.

Technique (public, from the Instant-NGP paper): L resolution levels with
per-level feature tables of T entries x F features; a 3D coordinate is
scaled to the level resolution, its 8 surrounding corners are hashed into
the table (xor of per-dimension primes, mod T), and the gathered features
are trilinearly interpolated; level outputs concatenate into the encoding.

TPU-first notes:
  * Implemented as batched jnp gathers (jnp.take) over [T, F] tables —
    XLA lowers these to dynamic-gathers and the backward to scatter-adds.
  * Levels are stacked into one [L, T, F] parameter so a single gather per
    corner serves all levels.
  * Feature dim F is kept on the last axis (lanes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Per-dimension hashing primes from the Instant-NGP paper; dim 0 is left
# unmultiplied (prime 1) like the original.
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashEncodingConfig:
    num_levels: int = 8  # L
    features_per_level: int = 2  # F
    log2_table_size: int = 14  # T = 2^14 entries per level
    base_resolution: int = 4  # N_min
    max_resolution: int = 128  # N_max (sets the growth factor)

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def level_resolutions(self) -> np.ndarray:
        """Geometric schedule N_l = round(N_min * b^l). Rounded (not
        floored): fp rounding makes b^(L-1) land a hair under its exact
        value, and flooring that would top the schedule out at
        N_max - 1 — the configured max_resolution must be reachable."""
        if self.num_levels == 1:
            return np.asarray([self.base_resolution])
        ln = np.linspace(
            np.log(self.base_resolution),
            np.log(self.max_resolution),
            self.num_levels,
        )
        return np.floor(np.exp(ln) + 0.5).astype(np.int64)


def init_hash_params(
    cfg: HashEncodingConfig, seed: int = 0, scale: float = 1e-4
) -> jnp.ndarray:
    """Uniform(-scale, scale) table init (the paper's initialization).
    Shape [L, T, F]."""
    rng = np.random.Generator(np.random.MT19937(seed))
    return jnp.asarray(
        rng.uniform(
            -scale,
            scale,
            size=(cfg.num_levels, cfg.table_size, cfg.features_per_level),
        ).astype(np.float32)
    )


def _hash_corner(ix, iy, iz, table_size: int):
    """Spatial hash of integer corner coords -> table index. uint32 xor of
    per-dimension primes, mod table size (a power of two)."""
    h = (
        ix.astype(jnp.uint32) * np.uint32(_PRIMES[0])
        ^ iy.astype(jnp.uint32) * np.uint32(_PRIMES[1])
        ^ iz.astype(jnp.uint32) * np.uint32(_PRIMES[2])
    )
    return (h & np.uint32(table_size - 1)).astype(jnp.int32)


def encode(cfg: HashEncodingConfig, tables: jnp.ndarray, coords: jnp.ndarray):
    """Encode 3D coordinates in [0, 1].

    tables: [L, T, F]; coords: [..., 3] -> [..., L*F].
    Differentiable in `tables` (and in `coords` through the interpolation
    weights).
    """
    batch_shape = coords.shape[:-1]
    x = coords.reshape(-1, 3)  # [N, 3]
    n = x.shape[0]
    res = jnp.asarray(cfg.level_resolutions(), jnp.float32)  # [L]

    # Scaled coordinates per level: [L, N, 3]
    xs = x[None, :, :] * (res[:, None, None] - 1.0)
    x0 = jnp.floor(xs)
    frac = xs - x0  # [L, N, 3]
    x0 = x0.astype(jnp.int32)

    feats = []
    for corner in range(8):
        dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
        cx = x0[..., 0] + dx
        cy = x0[..., 1] + dy
        cz = x0[..., 2] + dz
        idx = _hash_corner(cx, cy, cz, cfg.table_size)  # [L, N]
        # gather per level: tables [L, T, F] indexed along T
        f = jnp.take_along_axis(
            tables, idx[:, :, None].astype(jnp.int32), axis=1
        )  # [L, N, F]
        wx = jnp.where(dx == 1, frac[..., 0], 1.0 - frac[..., 0])
        wy = jnp.where(dy == 1, frac[..., 1], 1.0 - frac[..., 1])
        wz = jnp.where(dz == 1, frac[..., 2], 1.0 - frac[..., 2])
        feats.append(f * (wx * wy * wz)[:, :, None])
    out = sum(feats)  # [L, N, F]
    out = jnp.moveaxis(out, 0, 1).reshape(n, cfg.out_dim)
    return out.reshape(*batch_shape, cfg.out_dim)


def _axis_lerp(grid, n: int, r: int, axis: int):
    """Linearly resample `grid` from r+1 samples to n samples along `axis`
    using STATIC (numpy, trace-time) indices and weights — the regular-grid
    target positions v/(n-1)*(r-1) are known at trace time, so this lowers
    to two constant-index gathers + one FMA instead of per-point dynamic
    gathers."""
    if n == 1:
        idx0 = np.zeros((1,), np.int32)
        w = np.zeros((1,), np.float32)
    else:
        pos = np.arange(n, dtype=np.float64) / (n - 1) * (r - 1)
        idx0 = np.floor(pos).astype(np.int32)
        w = (pos - idx0).astype(np.float32)
    lo = jnp.take(grid, jnp.asarray(idx0), axis=axis)
    hi = jnp.take(grid, jnp.asarray(idx0 + 1), axis=axis)
    shape = [1] * grid.ndim
    shape[axis] = n
    wv = jnp.asarray(w).reshape(shape)
    return lo * (1.0 - wv) + hi * wv


def encode_grid(cfg: HashEncodingConfig, tables: jnp.ndarray, g) -> jnp.ndarray:
    """Hash-encode every point of a REGULAR grid (GridSpec g, coords
    v/(n-1) in [0,1] per axis) -> [nz, ny, nx, L*F].

    Mathematically the same trilinear hash encoding as `encode` on the
    grid's coordinates, restructured TPU-first: per level, the (R_l+1)^3
    corner-feature grid is gathered ONCE with hash indices precomputed in
    numpy at trace time (a single constant-index gather instead of 8
    dynamic gathers per cell x level — ~75M of them at 128x96x96), then
    trilinear interpolation factorizes into three separable static-index
    axis resamples (dense VPU FMAs). Equal to `encode` up to interpolation-
    weight precision: the static weights here are computed in float64,
    while `encode` derives them from f32 scaled coordinates, so the two
    drift by ~R*eps_f32 per level (~1e-5 absolute at R=128) — with THIS
    path the more accurate one.
    """
    nz, ny, nx = g.shape
    outs = []
    for lvl, r in enumerate(cfg.level_resolutions()):
        r = int(r)
        # static corner hash indices for the full (r+1)^3 corner lattice
        # (index r is reachable with weight 0 at the top edge; hashing it
        # mirrors `encode`'s out-of-range corner behavior)
        ii = np.arange(r + 1, dtype=np.uint32)
        hx = ii * np.uint32(_PRIMES[0])
        hy = ii * np.uint32(_PRIMES[1])
        hz = ii * np.uint32(_PRIMES[2])
        h = hz[:, None, None] ^ hy[None, :, None] ^ hx[None, None, :]
        idx = (h & np.uint32(cfg.table_size - 1)).astype(np.int32)  # [z,y,x]
        corner = jnp.take(tables[lvl], jnp.asarray(idx.ravel()), axis=0)
        corner = corner.reshape(r + 1, r + 1, r + 1, cfg.features_per_level)
        lev = _axis_lerp(corner, nz, r, 0)
        lev = _axis_lerp(lev, ny, r, 1)
        lev = _axis_lerp(lev, nx, r, 2)
        outs.append(lev)
    return jnp.concatenate(outs, axis=-1)
