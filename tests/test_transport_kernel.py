"""Parity tests for the fused Pallas transport kernel
(pallas/transport.py) against the XLA step (apps/transport.py) — same
ladder shape as the residual kernels' fused-vs-staged tests; runs in
interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu.apps import transport as tr
from phys_autodiff_tpu.pallas.transport import (
    transport_fused,
    transport_kernel_supported,
    transport_step_fused,
)
from phys_autodiff_tpu.utils.config import GridSpec


def _case(periodic, nz=6):
    g = GridSpec(nx=128, ny=16, nz=nz, hx=0.5, hy=0.25, hz=0.125,
                 dt=1e-3, periodic=periodic)
    rng = np.random.default_rng(nz + periodic)
    sigma = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    u = jnp.asarray(
        (rng.uniform(-0.95, 0.95, size=(3,) + g.shape)
         * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / 0.01
         ).astype(np.float32)
    )
    return g, sigma, u


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_step_matches_xla(periodic):
    g, sigma, u = _case(periodic)
    ref = tr.transport_step(g, sigma, u, 0.01)
    out = transport_step_fused(g, sigma, u, 0.01)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6
    )


def test_fused_rollout_matches_xla():
    g, sigma, u = _case(True, nz=8)
    cfg = tr.TransportConfig(dt=0.01, steps=4)
    ref, cfl_r = tr.transport(g, sigma, u, cfg)
    out, cfl_f = transport_fused(g, sigma, u, cfg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=5e-6
    )
    np.testing.assert_allclose(float(cfl_f), float(cfl_r), rtol=1e-6)


def test_fused_integer_shift_exact():
    g, sigma, _ = _case(True)
    dt = 0.01
    u = jnp.broadcast_to(
        jnp.asarray([g.hx / dt, g.hy / dt, g.hz / dt], jnp.float32)[
            :, None, None, None
        ],
        (3,) + g.shape,
    )
    from phys_autodiff_tpu.ops.stencil import shift

    out = transport_step_fused(g, sigma, u, dt)
    expect = shift(shift(shift(sigma, -1, 2, True), -1, 1, True), -1, 0, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=0, atol=1e-6
    )


def test_supported_predicate():
    assert transport_kernel_supported(
        GridSpec(nx=128, ny=96, nz=96, dt=1e-3)
    )
    assert not transport_kernel_supported(GridSpec(nx=96, ny=96, nz=64, dt=1e-3))
    assert not transport_kernel_supported(GridSpec(nx=128, ny=6, nz=5, dt=1e-3))


@pytest.mark.parametrize("periodic", [True, False])
def test_pre_weights_kernel_matches_xla(periodic):
    from phys_autodiff_tpu.pallas.transport import (
        transport_step_fused_pre,
        transport_weights,
    )

    g, sigma, u = _case(periodic)
    ref = tr.transport_step(g, sigma, u, 0.01)
    out = transport_step_fused_pre(
        g, sigma, transport_weights(g, u, 0.01)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6
    )
