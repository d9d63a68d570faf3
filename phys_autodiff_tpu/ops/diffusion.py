"""Implicit diffusion — the "diffuse" stage of the stable-fluids update.

The reference plan's smoke framing (reference:
docs/PLAN_MLP_SMOKE_INTEGRATION.md:51) sits in the Stam stable-fluids
tradition (advect / diffuse / project); the reference built none of the
stages. `apps/euler.py` supplies advect + project; this module supplies
diffuse, implicitly — solve (I - c*dt*L) f_new = f — so the step is
unconditionally stable at any diffusivity c and dt.

Operator choice: L is the COMPACT 7-point Laplacian
(f[i+1] - 2 f[i] + f[i-1])/h^2 per axis, NOT div(grad .) of the wide
residual stencil. The wide operator annihilates the per-axis Nyquist mode
(ops/projection.py "Null-space note"), so diffusion built on it would
leave checkerboard noise undamped forever — exactly the component a
physical viscosity must kill fastest. The compact symbol
-4 sin^2(pi k/n)/h^2 is strictly negative away from k=0 and maximal at
Nyquist, giving every non-constant mode a positive decay rate.

Two solvers, same contract as the projection pair:

  * `diffuse_fft(g, f, c, dt)` — periodic: one-shot exact inversion in
    Fourier space, 1/(1 + c dt 4 sum_a sin^2(pi k_a/n_a)/h_a^2). Three
    rfftn/irfftn pairs worth of work for a vector field; XLA-native.
  * `diffuse_cg(g, f, c, dt)` — clamp: CG on (I - c dt L). Under the
    framework's edge-clamp semantics the compact Laplacian is the
    symmetric Neumann matrix (edge row (f[1]-f[0])/h^2 pairs with the
    interior row's mirror entry), so A = I - c dt L is symmetric positive
    definite and plain CG converges monotonically — no normal equations
    needed (unlike the WIDE clamped operator in projection.project_cg,
    which is nonsymmetric).
  * `diffuse(g, f, c, dt)` — boundary-aware dispatch.

Both act on [nz, ny, nx] scalars or [3, nz, ny, nx] vectors (leading axes
broadcast through the FFT axes / operator), conserve the mean exactly
(the k=0 / constant mode is untouched), and are fully differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.ops.stencil import shift
from phys_autodiff_tpu.utils.config import GridSpec

_SPATIAL = (-3, -2, -1)  # z, y, x always ride the trailing axes


def laplacian(g: GridSpec, f: jnp.ndarray) -> jnp.ndarray:
    """Compact 7-point Laplacian sum_a (f[+1] - 2f + f[-1])/h_a^2 with the
    framework's boundary semantics (periodic wrap / edge clamp) on the
    trailing [nz, ny, nx] axes."""
    per = g.periodic
    out = jnp.zeros_like(f)
    for axis, h in ((_SPATIAL[0], g.hz), (_SPATIAL[1], g.hy),
                    (_SPATIAL[2], g.hx)):
        out = out + (
            shift(f, +1, axis % f.ndim, per)
            - 2.0 * f
            + shift(f, -1, axis % f.ndim, per)
        ) / (h * h)
    return out


def _compact_symbol(g: GridSpec):
    """-4 sin^2(pi k/n)/h^2 per axis, broadcast over the rfftn spectrum
    (x halved). Exact eigenvalues of the periodic compact Laplacian."""
    def s_of(k, n, h):
        s = np.sin(np.pi * k / n) / h
        return 4.0 * s * s

    kz = np.fft.fftfreq(g.nz) * g.nz
    ky = np.fft.fftfreq(g.ny) * g.ny
    kx = np.fft.rfftfreq(g.nx) * g.nx
    sz = jnp.asarray(s_of(kz, g.nz, g.hz).astype(np.float32))[:, None, None]
    sy = jnp.asarray(s_of(ky, g.ny, g.hy).astype(np.float32))[None, :, None]
    sx = jnp.asarray(s_of(kx, g.nx, g.hx).astype(np.float32))[None, None, :]
    return sz + sy + sx  # = -lap(k), >= 0


def diffuse_fft(g: GridSpec, f: jnp.ndarray, c: float, dt: float) -> jnp.ndarray:
    """Exact implicit diffusion step on a periodic grid:
    f_new = F^-1 [ F f / (1 + c dt (-lap(k))) ]."""
    assert g.periodic, "diffuse_fft requires periodic boundaries; use diffuse_cg"
    assert f.shape[-3:] == g.shape, (f.shape, g.shape)
    f_hat = jnp.fft.rfftn(f, axes=_SPATIAL)
    denom = 1.0 + jnp.float32(c) * jnp.float32(dt) * _compact_symbol(g)
    out = jnp.fft.irfftn(f_hat / denom, s=g.shape, axes=_SPATIAL)
    return out.astype(f.dtype)


def diffuse_cg(
    g: GridSpec,
    f: jnp.ndarray,
    c: float,
    dt: float,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Implicit diffusion step under clamp (or periodic) boundaries: CG on
    the SPD system (I - c dt L) f_new = f. Warm-started at f (the solution
    is a smoothing of it), so few iterations suffice for parabolic dt."""
    assert f.shape[-3:] == g.shape, (f.shape, g.shape)
    cdt = jnp.float32(c) * jnp.float32(dt)

    def op(x):
        return x - cdt * laplacian(g, x)

    out, _ = jax.scipy.sparse.linalg.cg(op, f, x0=f, tol=tol, maxiter=maxiter)
    return out.astype(f.dtype)


def diffuse(
    g: GridSpec,
    f: jnp.ndarray,
    c: float,
    dt: float,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Boundary-aware dispatch: exact FFT inversion on periodic grids,
    CG on clamp grids. No-op when c == 0 (static check)."""
    if c == 0.0:
        return f
    if g.periodic:
        return diffuse_fft(g, f, c, dt)
    return diffuse_cg(g, f, c, dt, maxiter=maxiter, tol=tol)
