"""Float64 PARAMETER-GRADIENT oracle for the MLP-field physics loss.

`ref/oracle.py` adjudicates forward values (residuals/losses) in float64;
this module adjudicates GRADIENTS: an independent float64 replica of the
whole staged pipeline (coords -> 2-layer MLP -> central residuals ->
weighted MSE), differentiated with jax.grad under `jax.experimental
.enable_x64`. It exists because comparing two float32 gradient
implementations against each other (the backward mega-kernel vs
jax.grad of the staged path) cannot tell WHICH one an observed gap
belongs to — in clamp mode the loss is small with near-cancelling
gradient contributions, and BOTH f32 arms sit ~1e-3 from the true
gradient while agreeing with each other only to ~2e-4 (measured,
32x16x8 clamp H=32). The f64 arm is the referee: a kernel whose
distance to the truth is no worse than jax.grad's own is correct.

Scope: central scheme, both coordinate norms (`norm=` selects; the
ZeroToOne arm carries the reference's t+0.5 time-channel quirk,
src/mlp_grid.cpp:38 — passing the wrong norm would silently grade the
gradient of a DIFFERENT function, so the norm is an explicit argument);
scalar constants are the float32-ROUNDED values promoted to f64, so the
truth differentiates exactly the function the f32 arms evaluate.

Not TPU code — runs on CPU, test/validation only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.utils.config import CoordNorm, GridSpec, PhysWeights


def _axis_coord_f32_values(n: int, norm: CoordNorm) -> np.ndarray:
    """Axis coordinates with the f32-rounded VALUES the f32 pipeline sees
    (models/coords._axis_coord), widened to f64."""
    if n <= 1:
        return np.zeros((max(n, 1),), np.float64)
    u = np.arange(n, dtype=np.float32) / np.float32(n - 1)
    if norm == CoordNorm.ZeroToOne:
        return u.astype(np.float64)
    # 2u - 1 is computed IN f32 (like models/coords._axis_coord) before
    # widening: for u < 0.25 the subtraction rounds, and the oracle must
    # differentiate the function evaluated at the f32 pipeline's inputs.
    return (np.float32(2.0) * u - np.float32(1.0)).astype(np.float64)


def f64_loss_fn(
    g: GridSpec, w: PhysWeights, norm: CoordNorm = CoordNorm.MinusOneToOne
):
    """loss(params64, t) -> scalar f64; differentiate with jax.grad inside
    `jax.experimental.enable_x64`. Semantics mirror models/fields
    .generate_fields + ops.residuals + ops.total_loss (central scheme).
    `norm` must match the pipeline under adjudication (ZeroToOne adds the
    reference's t+0.5 to the time channel)."""
    assert g.scheme == "central", "f64 oracle covers the central scheme"
    nz, ny, nx = g.shape
    xs = np.broadcast_to(
        _axis_coord_f32_values(nx, norm)[None, None, :], g.shape
    )
    ys = np.broadcast_to(
        _axis_coord_f32_values(ny, norm)[None, :, None], g.shape
    )
    zs = np.broadcast_to(
        _axis_coord_f32_values(nz, norm)[:, None, None], g.shape
    )
    spatial = jnp.asarray(np.stack([xs, ys, zs], axis=-1))  # [nz, ny, nx, 3]
    # f32-rounded step reciprocals, as the f32 arms compute them
    inv2 = {
        a: np.float64(np.float32(1.0 / (2.0 * float(np.float32(h)))))
        for a, h in (("x", g.hx), ("y", g.hy), ("z", g.hz), ("t", g.dt))
    }
    per = g.periodic

    def shift(f, d, axis):
        if per:
            return jnp.roll(f, -d, axis)
        n = f.shape[axis]
        return jnp.take(f, np.clip(np.arange(n) + d, 0, n - 1), axis)

    def cdiff(f, axis, s):
        return (shift(f, 1, axis) - shift(f, -1, axis)) * s

    def loss(params64, t):
        t = jnp.asarray(t, jnp.float64)
        dt = jnp.float64(np.float32(g.dt))
        fields = []
        for tt in (t - dt, t, t + dt):
            # ZeroToOne's time channel carries the reference's +0.5 quirk
            # (models/coords.grid_coords; src/mlp_grid.cpp:38)
            tch = tt + 0.5 if norm == CoordNorm.ZeroToOne else tt
            co = jnp.concatenate(
                [spatial, jnp.broadcast_to(tch, g.shape)[..., None]], -1
            )
            z1 = co @ params64["W1"] + params64["b1"]
            y = jnp.maximum(z1, 0.0) @ params64["W2"] + params64["b2"]
            fields.append((y[..., 0], jnp.moveaxis(y[..., 1:4], -1, 0)))
        (s0, u0), (s1, u1), (s2, u2) = fields
        dts = (s2 - s0) * inv2["t"]
        dtu = (u2 - u0) * inv2["t"]
        ds = [cdiff(s1, a, inv2[n]) for a, n in ((2, "x"), (1, "y"), (0, "z"))]
        du = [cdiff(u1, a + 1, inv2[n]) for a, n in ((2, "x"), (1, "y"), (0, "z"))]
        div_u = du[0][0] + du[1][1] + du[2][2]
        adv_s = u1[0] * ds[0] + u1[1] * ds[1] + u1[2] * ds[2]
        adv_u = u1[0][None] * du[0] + u1[1][None] * du[1] + u1[2][None] * du[2]
        r_s = dts + adv_s + s1 * div_u
        r_u = dtu + adv_u
        n_cells = np.float64(g.num_cells)
        return (
            np.float64(w.w_sigma) * jnp.sum(r_s * r_s) / n_cells
            + np.float64(w.w_u) * jnp.sum(r_u * r_u) / n_cells
        )

    return loss


def f64_loss_and_grad(
    g: GridSpec,
    w: PhysWeights,
    params,
    t,
    norm: CoordNorm = CoordNorm.MinusOneToOne,
):
    """(loss64, grads64): the float64 truth for f32 `params` at time `t`.

    Safe to call from an f32 process: x64 is enabled only around the f64
    trace/execution (the jax.enable_x64 scoped context), and the params
    are widened first so no value changes."""
    with jax.enable_x64():
        params64 = {
            k: jnp.asarray(np.asarray(v), np.float64) for k, v in params.items()
        }
        loss = f64_loss_fn(g, w, norm=norm)
        l64, gp64 = jax.value_and_grad(loss)(params64, float(t))
        return float(l64), {k: np.asarray(v) for k, v in gp64.items()}
