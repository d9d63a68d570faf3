"""Manufactured solutions and their discrete-analytic expected residuals.

The cornerstone validation technique of the reference test suite
(test/test_phys_cpu_ref.cpp:32-71): build a closed-form field, then compare
the computed residual against the *closed form of the discrete operator*
applied to that field (not the PDE limit), so agreement is to rounding error
rather than truncation error.

Solution 1 (test/test_phys_cpu_ref.cpp:33-48):
    sigma = sin(x + y + z - t),  u = (1, 1, 1)  on a periodic 2*pi box.
  Discrete-analytic residual (test/test_phys_cpu_ref.cpp:55-71):
    R_sigma = -cos(phi) * sin(dt)/dt
              + cos(phi) * (sin(hx)/hx + sin(hy)/hy + sin(hz)/hz)
    R_u = 0 (u constant).

Solution 2 — richer, divergence-free velocity
(test/test_phys_cuda_fused_vs_nonfused.cpp:30-51):
    sigma = sin(2x + 3y + 4z - t),  u = (sin z, cos x, sin y).
  Used for fused-vs-staged parity (no closed form needed; both arms are
  compared to each other).
"""

from __future__ import annotations

import numpy as np

from phys_autodiff_tpu.utils.config import GridSpec


def _mesh(g: GridSpec):
    """Physical coordinates x = ix*hx etc. on the [nz, ny, nx] grid."""
    z = np.arange(g.nz, dtype=np.float64)[:, None, None] * np.float64(np.float32(g.hz))
    y = np.arange(g.ny, dtype=np.float64)[None, :, None] * np.float64(np.float32(g.hy))
    x = np.arange(g.nx, dtype=np.float64)[None, None, :] * np.float64(np.float32(g.hx))
    return x, y, z


def periodic_box_spec(nx=64, ny=64, nz=32, dt=1e-3) -> GridSpec:
    """The 2*pi periodic box used by the oracle test
    (test/test_phys_cpu_ref.cpp:14-20)."""
    L = 2.0 * np.pi
    return GridSpec(
        nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz, dt=dt, periodic=True
    )


def solution1_fields(g: GridSpec, t: float):
    """sigma = sin(x+y+z-t), u = (1,1,1) at t-dt, t, t+dt; float32 outputs."""
    x, y, z = _mesh(g)
    phase = x + y + z

    def sigma_at(tt):
        return np.sin(phase - tt).astype(np.float32)

    ones = np.ones((3,) + g.shape, dtype=np.float32)
    return dict(
        sigma_tm1=sigma_at(t - g.dt),
        sigma_t=sigma_at(t),
        sigma_tp1=sigma_at(t + g.dt),
        u_tm1=ones,
        u_t=ones.copy(),
        u_tp1=ones.copy(),
    )


def solution1_expected_r_sigma(g: GridSpec, t: float) -> np.ndarray:
    """Discrete-analytic R_sigma for solution 1
    (test/test_phys_cpu_ref.cpp:55-71)."""
    x, y, z = _mesh(g)
    phi = x + y + z - t
    c_dt = np.sin(g.dt) / g.dt
    c_hx = np.sin(g.hx) / g.hx
    c_hy = np.sin(g.hy) / g.hy
    c_hz = np.sin(g.hz) / g.hz
    return (-np.cos(phi) * c_dt + np.cos(phi) * (c_hx + c_hy + c_hz)).astype(
        np.float32
    )


def solution2_fields(g: GridSpec, t: float):
    """sigma = sin(2x+3y+4z-t), u = (sin z, cos x, sin y) (divergence-free),
    constant in time (test/test_phys_cuda_fused_vs_nonfused.cpp:30-51)."""
    x, y, z = _mesh(g)
    phase = 2.0 * x + 3.0 * y + 4.0 * z

    def sigma_at(tt):
        return np.sin(phase - tt).astype(np.float32)

    shape = g.shape
    ux = np.broadcast_to(np.sin(z), shape)
    uy = np.broadcast_to(np.cos(x), shape)
    uz = np.broadcast_to(np.sin(y), shape)
    u = np.stack([ux, uy, uz]).astype(np.float32)
    return dict(
        sigma_tm1=sigma_at(t - g.dt),
        sigma_t=sigma_at(t),
        sigma_tp1=sigma_at(t + g.dt),
        u_tm1=u,
        u_t=u.copy(),
        u_tp1=u.copy(),
    )
