"""Incompressible Euler "smoke" solver — advect / force / project.

The downstream workload the reference's plan gestures at ("more realistic
smoke velocity fields", reference: docs/PLAN_MLP_SMOKE_INTEGRATION.md:51)
but never built: a stable fluid stepper in the Stam tradition, assembled
entirely from framework primitives —

  1. self-advect velocity     apps.transport's gather-free semi-Lagrangian
                              step applied per component (CFL <= 1),
  2. apply body forces        buoyancy `b * sigma * z_hat` on the smoke
                              density itself,
  3. project                  ops.projection (exact FFT on periodic boxes,
                              CGNR under clamp) so the discrete
                              divergence the residual operator sees is
                              driven to ~0,
  4. advect the density       through the projected velocity.

Everything is jnp under one jit; rollouts are a single lax.scan (no
data-dependent Python control flow); the semi-Lagrangian interpolation is
monotone, so sigma obeys the discrete max principle step over step.

This is an application ON the framework, not parity surface: the reference
never advances state in time (SURVEY.md §0 "no integrator"). It exists so
a trained field model — or any initial condition — can be rolled out as an
actual incompressible flow, and it exercises projection + transport +
diagnostics together.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from phys_autodiff_tpu.apps.transport import max_cfl, transport_step
from phys_autodiff_tpu.ops import diagnostics, projection
from phys_autodiff_tpu.utils.config import GridSpec


@dataclasses.dataclass(frozen=True)
class EulerConfig:
    dt: float = 1e-3
    steps: int = 1
    buoyancy: float = 0.0  # force = buoyancy * sigma along +z
    projection: str = "auto"  # "auto" | "fft" | "cg" | "none"
    cg_maxiter: int = 200
    cg_tol: float = 1e-6


class EulerState(NamedTuple):
    sigma: jnp.ndarray  # [nz, ny, nx]
    u: jnp.ndarray  # [3, nz, ny, nx]


def _project(g: GridSpec, u: jnp.ndarray, cfg: EulerConfig) -> jnp.ndarray:
    mode = cfg.projection
    if mode == "auto":
        mode = "fft" if g.periodic else "cg"
    if mode == "fft":
        return projection.project_fft(g, u)
    if mode == "cg":
        return projection.project_cg(
            g, u, maxiter=cfg.cg_maxiter, tol=cfg.cg_tol
        )
    if mode == "none":
        return u
    raise ValueError(f"unknown projection mode {cfg.projection!r}")


def euler_step(
    g: GridSpec, state: EulerState, cfg: EulerConfig
) -> EulerState:
    """One advect/force/project step. Velocity self-advection uses the
    pre-step velocity for the backtrace (standard semi-Lagrangian
    linearization); the density advects through the POST-projection
    velocity so it is transported by a divergence-free field."""
    sigma, u = state
    dt = jnp.float32(cfg.dt)
    # 1. self-advection, component-wise through the frozen pre-step u
    u_adv = jnp.stack(
        [transport_step(g, u[c], u, cfg.dt) for c in range(3)]
    )
    # 2. buoyancy: smoke density pushes +z
    if cfg.buoyancy != 0.0:
        fz = jnp.float32(cfg.buoyancy) * sigma
        u_adv = u_adv.at[2].add(dt * fz)
    # 3. pressure projection
    u_new = _project(g, u_adv, cfg)
    # 4. density transport through the divergence-free field
    sigma_new = transport_step(g, sigma, u_new, cfg.dt)
    return EulerState(sigma_new, u_new)


def rollout(
    g: GridSpec, state0: EulerState, cfg: EulerConfig
):
    """cfg.steps Euler steps as one lax.scan (call under jit).

    Returns (final EulerState, per-step diagnostics dict of arrays
    [steps]: max_cfl, max |div u|, mean kinetic energy)."""

    def body(state, _):
        new = euler_step(g, state, cfg)
        diag = (
            max_cfl(g, new.u, cfg.dt),
            projection.projection_residual(g, new.u),
            diagnostics.kinetic_energy(new.u),
        )
        return new, diag

    final, (cfls, divs, kes) = jax.lax.scan(
        body, state0, None, length=cfg.steps
    )
    return final, {"max_cfl": cfls, "max_abs_div": divs, "kinetic_energy": kes}


def initial_state_from_model(
    g: GridSpec, model_cfg, params, t: float, *, project: bool = True
) -> EulerState:
    """Seed the solver from a trained field model snapshot at time t
    (MLP or any registered encoder family), optionally projecting the
    model's velocity onto the divergence-free subspace first."""
    from phys_autodiff_tpu.models import fields as fields_mod
    from phys_autodiff_tpu.models import ngp as ngp_mod
    from phys_autodiff_tpu.utils.config import MLPGridConfig

    if isinstance(model_cfg, MLPGridConfig):
        y = fields_mod.grid_infer(g, model_cfg, params, t)
    else:
        y = ngp_mod.grid_infer(g, model_cfg, params, t)
    sigma = y[..., 0]
    u = jnp.moveaxis(y[..., 1:4], -1, 0)
    if project:
        u = projection.project(g, u)
    return EulerState(sigma, u)
