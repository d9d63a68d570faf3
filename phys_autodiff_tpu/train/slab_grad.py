"""Slab-blocked recompute backward for the full training loss.

The round-1 training step backward was plain `jax.grad` through the staged
field generator: it re-ran the coordinate-tensor MLP forward (~6 ms), kept
the full [3N, H] hidden-activation residual in HBM (>1.8 GB at the flagship
grid — the single-chip memory ceiling), and paid HIGHEST-precision thin
matmuls, totalling ~24 ms/step vs a ~2 ms fused forward.

This module is the TPU-native answer to the reference's fused backward
(`k_backward_fused`, src/phys_cuda_fused.cu:102-172 — recompute everything,
store nothing) extended through the MLP (src/mlp_cuda.cu:39-89), as a
z-slab-blocked gradient:

    L(params) = 1/N * sum_k  L_k(params)
    grad L    = 1/N * sum_k  grad L_k(params)

where L_k is the raw (unnormalized) weighted residual sum over slab k's
rows. Each L_k recomputes its fields from the MLP on the slab extended by
one halo row per side (z boundary encoded by wrapped/clamped row indices),
so `jax.value_and_grad(L_k)` inside a `lax.scan` yields the exact global
gradient while only ever materializing slab-sized intermediates — the
activation residual shrinks from [3N, H] to [3 * rows_per_slab * ny * nx, H]
and the memory ceiling scales with the slab, not the grid.

The MLP forward inside the slab is the rank-1-factored form (the same
factorization as the fused Pallas kernel, pallas/mlp.py): layer 1 is a sum
of per-axis tables instead of an MXU-hostile In=4 contraction, so the
recompute costs one VPU add per hidden unit plus the layer-2 matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.models.coords import _axis_coord
from phys_autodiff_tpu.ops.stencil import residuals_zext
from phys_autodiff_tpu.utils.config import CoordNorm, GridSpec, MLPGridConfig, PhysWeights

# Per-slab hidden-activation budget (bytes) used to pick the slab height.
_A1_BUDGET = 192 * 1024 * 1024


def pick_slab_rows(g: GridSpec, h: int, budget: int = _A1_BUDGET) -> int:
    """Largest divisor of nz whose slab a1 tensor fits the budget."""
    row_bytes = 3 * g.ny * g.nx * h * 4
    best = 1
    for sz in range(1, g.nz + 1):
        if g.nz % sz != 0:
            continue
        if (sz + 2) * row_bytes <= budget:
            best = sz
    return best


from phys_autodiff_tpu.utils.config import dot_precision as _dot_prec


def slab_fields_rows(
    g: GridSpec,
    cfg: MLPGridConfig,
    params: mlp.Params,
    ts,
    z_idx,
    precision: str = "f32",
):
    """MLP fields at the given z rows (global indices, already wrapped or
    clamped) for the slice times `ts` [S].

    Returns (sigma [S, R, ny, nx], u [S, 3, R, ny, nx]).

    Rank-1 layer-1: z1[s,r,y,x,h] = cx[x]W1x[h] + cy[y]W1y[h] + cz[r]W1z[h]
    + (ts[s]+off)W1t[h] + b1[h]; only layer 2 contracts (K = H).
    """
    w1 = params["W1"]
    h = w1.shape[1]
    cx = _axis_coord(g.nx, cfg.norm)
    cy = _axis_coord(g.ny, cfg.norm)
    cz = jnp.take(_axis_coord(g.nz, cfg.norm), z_idx)
    t_off = jnp.float32(0.0 if cfg.norm == CoordNorm.MinusOneToOne else 0.5)

    ax = jnp.outer(cx, w1[0])  # [nx, H]
    ay = jnp.outer(cy, w1[1])  # [ny, H]
    az = jnp.outer(cz, w1[2])  # [R, H]
    at = jnp.outer(jnp.asarray(ts, jnp.float32) + t_off, w1[3]) + params["b1"]  # [S,H]

    # Group into two small tables first so the full-size tensor takes ONE
    # broadcast add instead of three (the z1 build is a VPU/HBM hot spot).
    ab = ax[None, :, :] + ay[:, None, :]  # [ny, nx, H]
    cd = az[None, :, :] + at[:, None, :]  # [S, R, H]
    z1 = ab[None, None] + cd[:, :, None, None]  # [S, R, ny, nx, H]
    a1 = jnp.maximum(z1, 0.0)
    w2 = params["W2"]
    if precision == "bf16":
        a1 = a1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)
    y = (
        jax.lax.dot_general(
            a1,
            w2,
            dimension_numbers=(((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(precision),
        )
        + params["b2"]
    )  # [S, R, ny, nx, 4]
    sigma = y[..., 0]
    u = jnp.moveaxis(y[..., 1:4], -1, 1)  # [S, 3, R, ny, nx]
    return sigma, u


def make_slab_raw(
    g: GridSpec,
    w: PhysWeights,
    cfg: MLPGridConfig,
    sz: int | None = None,
    precision: str = "f32",
):
    """Returns (slab_raw, sz): slab_raw(params, t, k) is the raw
    (unnormalized) weighted residual-square sum of z-slab k, recomputing its
    fields from the MLP on a one-halo-row extension. The shared building
    block of the single-chip slab gradient and the sharded fused step
    (parallel/sharded.py) — per-slab values are identical in both, which is
    what makes the sharded loss reduction bit-comparable."""
    if sz is None:
        sz = pick_slab_rows(g, cfg.dims.H)
    assert g.nz % sz == 0, f"slab rows {sz} must divide nz={g.nz}"
    nz = g.nz
    ws = np.float32(w.w_sigma)
    wu = np.float32(w.w_u)

    def slab_raw(params, t, k):
        base = k * sz - 1 + jnp.arange(sz + 2)
        idx = jnp.mod(base, nz) if g.periodic else jnp.clip(base, 0, nz - 1)
        t = jnp.float32(t)
        dt = jnp.float32(g.dt)
        ts = jnp.stack([t - dt, t, t + dt])
        sigma, u = slab_fields_rows(g, cfg, params, ts, idx, precision)
        rs, ru = residuals_zext(g, sigma, u)
        return ws * jnp.sum(rs * rs) + wu * jnp.sum(ru * ru)

    return slab_raw, sz


def make_slab_loss_and_grad(
    g: GridSpec,
    w: PhysWeights,
    cfg: MLPGridConfig,
    sz: int | None = None,
    precision: str = "f32",
):
    """Returns fn(params, t) -> (loss, (grad_params, grad_t)).

    loss is the exact staged total loss (same residual math, same 1/N
    scaling); the gradient is accumulated slab-by-slab under lax.scan with
    fixed slab order (deterministic reduction).
    """
    slab_raw, sz = make_slab_raw(g, w, cfg, sz, precision)
    n_slabs = g.nz // sz
    inv_n = np.float32(1.0 / g.num_cells)

    vg = jax.value_and_grad(slab_raw, argnums=(0, 1))

    def loss_and_grad(params, t):
        zero_g = (
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jnp.zeros_like(jnp.float32(t)),
        )

        def body(carry, k):
            acc_l, acc_g = carry
            lk, gk = vg(params, t, k)
            acc_g = jax.tree_util.tree_map(jnp.add, acc_g, gk)
            return (acc_l + lk, acc_g), None

        (raw_l, raw_g), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zero_g), jnp.arange(n_slabs)
        )
        scale = lambda x: x * inv_n
        return raw_l * inv_n, jax.tree_util.tree_map(scale, raw_g)

    return loss_and_grad


def make_fused_loss(
    g: GridSpec,
    w: PhysWeights,
    cfg: MLPGridConfig,
    precision: str = "f32",
    sz: int | None = None,
    interpret=None,
    backward: str = "mega",
):
    """Scalar training loss with a fully-fused compute path in BOTH
    directions: forward = the MLP->residual->loss MEGA-kernel (fields never
    leave VMEM; pallas/mega.py), backward = the fused backward mega-kernel
    (pallas/mega_bwd.py — the k_backward_fused analogue: one pass computes
    all parameter gradients with nothing grid-sized in HBM) or the
    slab-blocked recompute gradient above (backward="slab"; also the
    automatic fallback for upwind/unaligned configurations).

    Returns loss_fn(params, t) -> scalar, usable under jax.value_and_grad.
    """
    from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline

    # Forward pipeline choice (hardware-measured, docs/BENCHMARK_REPORT.md):
    # on 128-aligned nx the mega kernel wins; on unaligned grids the
    # FLAT-layout fieldgen + loss pipeline beats the lane-padded mega kernel
    # (64^3: 0.45 vs 0.85 ms f32), except bf16 at R % 16 != 0 where the
    # fieldgen loses its bf16 edge to sublane-tile misalignment.
    from phys_autodiff_tpu.pallas.residuals import flat_rows

    from phys_autodiff_tpu.pallas.mega import mega_forward_fits

    _r = flat_rows(g)
    _flat_fast = (
        g.nx % 128 != 0
        and _r is not None
        and (not precision.startswith("bf16") or _r % 16 == 0)
    )
    _deep_z = (
        not mega_forward_fits(g, cfg.dims.H)
        and (g.nx % 128 == 0 or _r is not None)
    )
    if _flat_fast or _deep_z:
        # Unaligned-nx grids where the flat pipeline measured faster, AND
        # deep-z grids past the mega forward's VMEM ceiling (its CD window
        # is nz-resident — pallas/mega.py:mega_forward_fits), take the
        # two-kernel fieldgen + loss pipeline, which blocks per z row.
        from phys_autodiff_tpu.pallas.mlp import fused_loss_pipeline

        def forward_pipeline(params, t):
            return fused_loss_pipeline(g, w, cfg, params, t, precision, interpret)

    else:

        def forward_pipeline(params, t):
            return mega_loss_pipeline(g, w, cfg, params, t, precision, interpret)

    from phys_autodiff_tpu.pallas.mega_bwd import mega_fits, mega_supported

    if backward == "mega" and mega_supported(g) and mega_fits(g, cfg.dims.H):
        from phys_autodiff_tpu.pallas.mega_bwd import mega_loss_and_grad

        def lg(params, t):
            _, grads = mega_loss_and_grad(
                g, w, cfg, params, t, precision, interpret
            )
            return None, grads

    else:
        slab = make_slab_loss_and_grad(g, w, cfg, sz=sz, precision=precision)

        def lg(params, t):
            _, grads = slab(params, t)
            return None, grads

    @jax.custom_vjp
    def loss(params, t):
        ls, lu = forward_pipeline(params, t)
        return ls + lu

    def fwd(params, t):
        return loss(params, t), (params, t)

    def bwd(res, ct):
        params, t = res
        _, (gp, gt) = lg(params, t)
        return (
            jax.tree_util.tree_map(lambda x: ct * x, gp),
            ct * gt,
        )

    loss.defvjp(fwd, bwd)
    return loss
