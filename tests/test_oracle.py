"""Tier-1 oracle tests: f64 oracle vs discrete-analytic manufactured solution.

Port of the reference's test/test_phys_cpu_ref.cpp: grid 64x64x32 on a
periodic 2*pi box, dt=1e-3, sigma = sin(x+y+z-t), u=(1,1,1); the computed
residual must match the closed form of the discrete operator to
rel_l2 <= 3e-4 / max_abs <= 1e-3 (:87), R_u must vanish (:76-79), and the
loss/VJP scaling must match to 1e-7/1e-6 (:104-123).
"""

import numpy as np

from phys_autodiff_tpu.ref import manufactured, oracle
from phys_autodiff_tpu.utils import tolerances as tol
from phys_autodiff_tpu.utils.config import PhysWeights
from phys_autodiff_tpu.utils.metrics import max_abs_err, rel_l2_err

T0 = 1.2345  # test/test_phys_cpu_ref.cpp:29


def test_oracle_residuals_vs_discrete_analytic():
    g = manufactured.periodic_box_spec()
    f = manufactured.solution1_fields(g, T0)
    r_sigma, r_u = oracle.residuals(g, **f)
    expected = manufactured.solution1_expected_r_sigma(g, T0)

    assert rel_l2_err(r_sigma, expected) <= tol.ORACLE_VS_ANALYTIC_REL
    assert max_abs_err(r_sigma, expected) <= tol.ORACLE_VS_ANALYTIC_MAX
    # constant u => R_u ~ 0 (test/test_phys_cpu_ref.cpp:76-79)
    assert np.max(np.abs(r_u)) <= 1e-6


def test_oracle_loss_and_backward():
    g = manufactured.periodic_box_spec()
    f = manufactured.solution1_fields(g, T0)
    w = PhysWeights(w_sigma=1.7, w_u=0.9)  # test/test_phys_cpu_ref.cpp:93

    l_sigma, l_u, r_sigma, r_u = oracle.loss_forward(g, w, **f, return_residuals=True)
    n = g.num_cells
    # L_sigma must equal w_sigma * mean(R_sigma^2) computed independently
    expect_ls = w.w_sigma * np.mean(np.asarray(r_sigma, np.float64) ** 2)
    assert abs(float(l_sigma) - expect_ls) / expect_ls <= tol.LOSS_REL
    # constant u => L_u ~ 0
    assert float(l_u) <= 1e-12

    g_sigma, g_u = oracle.loss_backward(g, w, r_sigma, r_u)
    expect_g = (2.0 * w.w_sigma / n) * np.asarray(r_sigma, np.float64)
    assert rel_l2_err(g_sigma, expect_g) <= tol.F32_VS_ORACLE_RU_REL
    assert max_abs_err(g_sigma, expect_g) <= tol.F32_VS_ORACLE_RU_MAX
    assert np.max(np.abs(g_u)) <= 1e-7  # test/test_phys_cpu_ref.cpp:113


def test_oracle_clamp_boundary_edge_formula():
    """Clamp mode: at x=0 the 'central' difference must degenerate to
    (f[1]-f[0])/(2h) (src/phys_cpu.cpp:8-10 clampi semantics)."""
    rng = np.random.default_rng(0)
    from phys_autodiff_tpu.utils.config import GridSpec

    g = GridSpec(nx=8, ny=4, nz=4, hx=0.5, hy=0.5, hz=0.5, dt=0.01, periodic=False)
    shape = g.shape
    sigma = rng.standard_normal(shape).astype(np.float32)
    zeros_u = np.zeros((3,) + shape, dtype=np.float32)
    # u = (1,0,0) constant: R_sigma = dsigma/dt + dsigma/dx; freeze time.
    u = zeros_u.copy()
    u[0] = 1.0
    r_sigma, _ = oracle.residuals(g, sigma, sigma, sigma, u, u, u)
    # interior check at x=3
    expect_mid = (sigma[2, 2, 4].astype(np.float64) - sigma[2, 2, 2]) / (2 * g.hx)
    np.testing.assert_allclose(r_sigma[2, 2, 3], expect_mid, rtol=1e-5)
    # clamped edge at x=0: (f[1]-f[0])/(2h)
    expect_edge = (sigma[2, 2, 1].astype(np.float64) - sigma[2, 2, 0]) / (2 * g.hx)
    np.testing.assert_allclose(r_sigma[2, 2, 0], expect_edge, rtol=1e-5)
