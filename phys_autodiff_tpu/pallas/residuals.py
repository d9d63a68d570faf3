"""Fused Pallas TPU kernels for the transport residual operator.

The TPU-native equivalent of the reference's flagship fused CUDA kernels:
  * k_residuals_fused (src/phys_cuda_fused.cu:33-100) — one pass over the six
    input fields computing all derivatives in registers and writing only the
    residuals, zero intermediates.
  * k_backward_fused (src/phys_cuda_fused.cu:102-172) — recomputes the entire
    residual pipeline and applies g = scale * R in the same kernel; backward
    never reads stored residuals.
  * plus the fused *loss forward* with in-kernel reduction that the reference
    planned but never implemented (docs/PLAN_FUSED_PHYS_LOSS.md:59).

Kernel design (TPU-first, not a CUDA translation):
  * Grid over z-slabs of SZ planes. Within a program, the whole [SZ, ny, nx]
    slab is computed as vector ops (VPU) — ny on sublanes, nx on lanes.
  * Only sigma_t and u_t need spatial halos (the t-/t+ slices enter through
    the time derivative alone), so those four fields live in HBM
    (memory_space=ANY) and are staged into VMEM scratch with explicit async
    DMAs: one SZ-plane main copy plus two single-plane halo copies whose
    source indices implement periodic wrap or clamp. The other eight field
    slabs use plain BlockSpec pipelining.
  * Manual copies are double-buffered across grid steps: program i kicks off
    slab i+1's DMAs before waiting on its own, overlapping halo traffic with
    compute (the analogue of the reference's "next step" shared-memory tiling
    plan, docs/PLAN_FUSED_PHYS_LOSS.md:38-41, which was never built).
  * In-plane +-1 shifts: pltpu.roll (periodic) or edge-duplicating
    concatenation (clamp), matching src/phys_cpu.cpp:8-15 semantics exactly.

`residuals_fused` carries a jax.custom_vjp whose backward is the TRUE field
adjoint (stencil transpose) obtained from the differentiable ops/ path — the
capability gap called out in the survey (the reference's backward stops at
the residual-space VJP, include/phys.h:54).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu.ops import stencil as ops_stencil
from phys_autodiff_tpu.ops.stencil import FieldSnapshots
from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights

# VMEM working-set budget used to pick the slab size (bytes); conservative
# (this chip accepts far larger vmem limits, but bigger slabs measured no
# faster — see docs/DESIGN.md) and leaves the compiler headroom.
_VMEM_BUDGET = 10 * 1024 * 1024


def pick_slab_size(g: GridSpec, max_sz: int = 16) -> int:
    """Largest divisor of nz <= max_sz whose working set fits the budget.

    Working set (planes of ny*nx f32):
      BlockSpec ins  : 8 fields * SZ planes * 2 pipeline buffers
      outs           : 4 fields * SZ * 2
      manual scratch : 4 fields * (SZ+2) * 2 slots
    """
    plane_bytes = g.ny * g.nx * 4
    best = 1
    for sz in range(1, max_sz + 1):
        if g.nz % sz != 0:
            continue
        planes = 16 * sz + 8 * sz + 8 * (sz + 2)
        if planes * plane_bytes <= _VMEM_BUDGET:
            best = sz
    return best


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# In-plane shift helpers (value-level, inside the kernel)
# ---------------------------------------------------------------------------


def _shift_last(v, delta: int, periodic: bool, nx_true: int | None = None):
    """v at index i+delta along the last (nx, lane) axis.

    nx_true < v.shape[-1] means the lane dim is PADDED to a 128 multiple
    (mega kernels on unaligned grids): the shift then wraps/clamps at the
    TRUE extent — boundary lanes select the true-wrap value from a second
    roll, and junk lanes (>= nx_true) are left to compute garbage that the
    caller masks out of any reduction."""
    n = v.shape[-1]
    if nx_true is None or nx_true == n:
        if periodic:
            # np.roll(v, -delta) == pltpu.roll(v, n - delta); shifts >= 0
            return pltpu.roll(v, (n - delta) % n, axis=v.ndim - 1)
        if delta > 0:
            return jnp.concatenate(
                [v[..., delta:], v[..., -1:].repeat(delta, -1)], -1
            )
        d = -delta
        return jnp.concatenate([v[..., :1].repeat(d, -1), v[..., : n - d]], -1)

    assert delta in (1, -1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    naive = pltpu.roll(v, (n - delta) % n, axis=v.ndim - 1)
    if delta == 1:
        # x+1; at x = nx_true-1 wrap to x=0 (shift left by nx_true-1 ==
        # roll by n-(nx_true-1)) or clamp to self
        wrap = pltpu.roll(v, (n - (1 - nx_true)) % n, axis=v.ndim - 1)
        edge_val = wrap if periodic else v
        return jnp.where(lane == nx_true - 1, edge_val, naive)
    # x-1; at x = 0 wrap to x = nx_true-1 or clamp to self
    wrap = pltpu.roll(v, (n - (nx_true - 1)) % n, axis=v.ndim - 1)
    edge_val = wrap if periodic else v
    return jnp.where(lane == 0, edge_val, naive)


def _shift_sub(v, delta: int, periodic: bool):
    """v at index i+delta along the second-to-last (ny, sublane) axis."""
    n = v.shape[-2]
    ax = v.ndim - 2
    if periodic:
        return pltpu.roll(v, (n - delta) % n, axis=ax)
    if delta > 0:
        edge = v[..., -1:, :]
        reps = [1] * v.ndim
        reps[ax] = delta
        return jnp.concatenate([v[..., delta:, :], jnp.tile(edge, reps)], ax)
    d = -delta
    edge = v[..., :1, :]
    reps = [1] * v.ndim
    reps[ax] = d
    return jnp.concatenate([jnp.tile(edge, reps), v[..., : n - d, :]], ax)


# ---------------------------------------------------------------------------
# FLAT layout: planes as [R, 128] lane rows (R = ny*nx/128)
# ---------------------------------------------------------------------------
#
# Mosaic tiles HBM arrays to 128 lanes, so the manual-DMA slab kernels need a
# 128-multiple minor dim. Rather than padding (junk lanes, 1.3-2x wasted
# traffic), the flat layout reinterprets each [ny, nx] plane as R = ny*nx/128
# rows of exactly 128 lanes — a pure C-order reshape, which makes it
# BIT-IDENTICAL to the reference's own flat x-fastest layout
# (idx = (z*ny+y)*nx+x, src/phys_cpu.cpp:17-19) chunked into lane rows.
# In-plane +-1/+-nx stencil shifts become cyclic flat shifts (lane roll +
# row-carry select) with x/y boundary corrections masked in by flat-index
# position. (Round 5 nuance: at pad ratios <= 1.5 the HALO-padded-lane arm
# below beats this layout — its wrap-continuation pads make every x-shift a
# select-free roll, and the extra traffic costs less than these select
# chains. See "PADDED-LANE public API" and DESIGN.md's unaligned-nx matrix.)


def flat_rows(g: GridSpec) -> int | None:
    """Lane rows per plane in the flat layout, or None if ny*nx % 128 != 0."""
    p = g.ny * g.nx
    return p // 128 if p % 128 == 0 else None


def _flat_cyclic_shift(v, s: int):
    """Cyclic flat shift within each [R, L] plane (trailing two dims):
    out[..., r, l] = v[..., flat (r*L + l + s) mod R*L]."""
    r_dim, lanes = v.shape[-2], v.shape[-1]
    s = s % (r_dim * lanes)
    if s == 0:
        return v
    row_s, lane_s = divmod(s, lanes)
    a = pltpu.roll(v, (lanes - lane_s) % lanes, axis=v.ndim - 1) if lane_s else v
    base = pltpu.roll(a, (r_dim - row_s) % r_dim, axis=v.ndim - 2) if row_s else a
    if lane_s == 0:
        return base
    carry = pltpu.roll(a, (r_dim - row_s - 1) % r_dim, axis=v.ndim - 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    return jnp.where(lane < lanes - lane_s, base, carry)


def make_flat_shifters(g: GridSpec):
    """(shift_x, shift_y) closures implementing +-1 (x) and +-nx (y) stencil
    shifts on flat [.., R, 128] planes, with wrap/clamp boundary handling
    matching src/phys_cpu.cpp:8-15. shift_y under periodic needs NO
    correction: the plane-cyclic shift by +-nx IS the y-wrap."""
    nx, ny, per = g.nx, g.ny, g.periodic

    def _flat_idx(v):
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape[-2:], 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape[-2:], 1)
        return rows * v.shape[-1] + lanes

    def shift_x(v, d):
        assert d in (1, -1)
        naive = _flat_cyclic_shift(v, d)
        x = _flat_idx(v) % nx
        at_edge = (x == nx - 1) if d == 1 else (x == 0)
        edge = _flat_cyclic_shift(v, d * (1 - nx)) if per else v
        return jnp.where(at_edge, edge, naive)

    def shift_y(v, d):
        assert d in (1, -1)
        naive = _flat_cyclic_shift(v, d * nx)
        if per:
            return naive
        y = _flat_idx(v) // nx
        at_edge = (y == ny - 1) if d == 1 else (y == 0)
        return jnp.where(at_edge, v, naive)

    return shift_x, shift_y


# ---------------------------------------------------------------------------
# Shared kernel body: residuals of one z-slab
# ---------------------------------------------------------------------------


def _slab_residuals(
    g: GridSpec,
    s,
    u3,
    s_tm1,
    s_tp1,
    u_tm1,
    u_tp1,
    nx_true: int | None = None,
    shifters=None,
):
    """Residuals for one slab.

    s       : sigma_t slab with z halo, [SZ+2, ny, nx]
    u3      : (ux, uy, uz) slabs with z halo, each [SZ+2, ny, nx]
    s_tm1.. : center slabs [SZ, ny, nx] / [3, SZ, ny, nx]
    nx_true : true x extent when the lane dim is padded (mega kernels on
              unaligned grids) — lanes >= nx_true carry garbage the caller
              must mask out of reductions.
    shifters: optional (shift_x, shift_y) overriding the in-plane +-1 shift
              implementation (the flat-layout kernels pass
              make_flat_shifters(g); plane dims are then [R, 128]).
    Returns (r_sigma [SZ,ny,nx], r_ux, r_uy, r_uz).
    """
    inv2dt = np.float32(1.0 / (2.0 * float(np.float32(g.dt))))
    inv2hx = np.float32(1.0 / (2.0 * float(np.float32(g.hx))))
    inv2hy = np.float32(1.0 / (2.0 * float(np.float32(g.hy))))
    inv2hz = np.float32(1.0 / (2.0 * float(np.float32(g.hz))))
    per = g.periodic

    if shifters is None:
        sx = lambda c, d: _shift_last(c, d, per, nx_true)
        sy = lambda c, d: _shift_sub(c, d, per)
    else:
        sx, sy = shifters

    def ddx(c):
        return (sx(c, 1) - sx(c, -1)) * inv2hx

    def ddy(c):
        return (sy(c, 1) - sy(c, -1)) * inv2hy

    def ddz(halo):  # halo: [SZ+2, ny, nx]
        return (halo[2:] - halo[:-2]) * inv2hz

    sc = s[1:-1]
    ux, uy, uz = u3[0][1:-1], u3[1][1:-1], u3[2][1:-1]

    dt_sigma = (s_tp1 - s_tm1) * inv2dt

    dux_dx, dux_dy, dux_dz = ddx(ux), ddy(ux), ddz(u3[0])
    duy_dx, duy_dy, duy_dz = ddx(uy), ddy(uy), ddz(u3[1])
    duz_dx, duz_dy, duz_dz = ddx(uz), ddy(uz), ddz(u3[2])
    div_u = dux_dx + duy_dy + duz_dz  # central in both schemes

    if g.scheme == "upwind":
        invhx = np.float32(2.0) * inv2hx
        invhy = np.float32(2.0) * inv2hy
        invhz = np.float32(2.0) * inv2hz

        def adv(c, halo):
            bx = (c - sx(c, -1)) * invhx
            fx = (sx(c, 1) - c) * invhx
            by = (c - sy(c, -1)) * invhy
            fy = (sy(c, 1) - c) * invhy
            bz = (c - halo[:-2]) * invhz
            fz = (halo[2:] - c) * invhz
            return (
                ux * jnp.where(ux > 0.0, bx, fx)
                + uy * jnp.where(uy > 0.0, by, fy)
                + uz * jnp.where(uz > 0.0, bz, fz)
            )

        adv_sigma = adv(sc, s)
        adv_ux = adv(ux, u3[0])
        adv_uy = adv(uy, u3[1])
        adv_uz = adv(uz, u3[2])
    else:
        ds_dx, ds_dy, ds_dz = ddx(sc), ddy(sc), ddz(s)
        adv_sigma = ux * ds_dx + uy * ds_dy + uz * ds_dz
        adv_ux = ux * dux_dx + uy * dux_dy + uz * dux_dz
        adv_uy = ux * duy_dx + uy * duy_dy + uz * duy_dz
        adv_uz = ux * duz_dx + uy * duz_dy + uz * duz_dz

    r_sigma = dt_sigma + adv_sigma + sc * div_u
    r_ux = (u_tp1[0] - u_tm1[0]) * inv2dt + adv_ux
    r_uy = (u_tp1[1] - u_tm1[1]) * inv2dt + adv_uy
    r_uz = (u_tp1[2] - u_tm1[2]) * inv2dt + adv_uz
    return r_sigma, r_ux, r_uy, r_uz


# ---------------------------------------------------------------------------
# The pallas_call builder
# ---------------------------------------------------------------------------


def _edge_copies(g: GridSpec, sz: int, slab, hbm_refs, bufs, sems, slot):
    """Edge-slab staging: 3 DMAs per field — main slab + two single-plane
    halos whose source indices implement wrap (periodic) or clamp."""
    nz = g.nz
    z0 = slab * sz
    if g.periodic:
        zlo = jax.lax.rem(z0 - 1 + nz, nz)
        zhi = jax.lax.rem(z0 + sz, nz)
    else:
        zlo = jnp.maximum(z0 - 1, 0)
        zhi = jnp.minimum(z0 + sz, nz - 1)
    copies = []
    for k, (src, dst) in enumerate(zip(hbm_refs, bufs)):
        copies.append(
            pltpu.make_async_copy(
                src.at[pl.ds(z0, sz)], dst.at[slot, pl.ds(1, sz)], sems.at[slot, k, 0]
            )
        )
        copies.append(
            pltpu.make_async_copy(
                src.at[pl.ds(zlo, 1)], dst.at[slot, pl.ds(0, 1)], sems.at[slot, k, 1]
            )
        )
        copies.append(
            pltpu.make_async_copy(
                src.at[pl.ds(zhi, 1)],
                dst.at[slot, pl.ds(sz + 1, 1)],
                sems.at[slot, k, 2],
            )
        )
    return copies


def _interior_copies(g: GridSpec, sz: int, slab, hbm_refs, bufs, sems, slot):
    """Interior-slab staging: the halo-extended range [z0-1, z0+sz] is one
    contiguous block, so each field needs exactly ONE DMA (vs 3 at edges) —
    per-DMA issue/wait latency dominates these small transfers."""
    z0 = slab * sz
    return [
        pltpu.make_async_copy(
            src.at[pl.ds(z0 - 1, sz + 2)], dst.at[slot], sems.at[slot, k, 0]
        )
        for k, (src, dst) in enumerate(zip(hbm_refs, bufs))
    ]


def _start_slab(g, sz, n_slabs, slab, hbm_refs, bufs, sems, slot):
    if n_slabs <= 2:  # every slab touches a boundary; sz+2 may exceed nz
        for c in _edge_copies(g, sz, slab, hbm_refs, bufs, sems, slot):
            c.start()
        return
    is_edge = jnp.logical_or(slab == 0, slab == n_slabs - 1)

    @pl.when(jnp.logical_not(is_edge))
    def _():
        for c in _interior_copies(g, sz, slab, hbm_refs, bufs, sems, slot):
            c.start()

    @pl.when(is_edge)
    def _():
        for c in _edge_copies(g, sz, slab, hbm_refs, bufs, sems, slot):
            c.start()


def _wait_slab(g, sz, n_slabs, slab, hbm_refs, bufs, sems, slot):
    if n_slabs <= 2:
        for c in _edge_copies(g, sz, slab, hbm_refs, bufs, sems, slot):
            c.wait()
        return
    is_edge = jnp.logical_or(slab == 0, slab == n_slabs - 1)

    @pl.when(jnp.logical_not(is_edge))
    def _():
        for c in _interior_copies(g, sz, slab, hbm_refs, bufs, sems, slot):
            c.wait()

    @pl.when(is_edge)
    def _():
        for c in _edge_copies(g, sz, slab, hbm_refs, bufs, sems, slot):
            c.wait()


def _build_fused_call(g: GridSpec, scales, reduce_loss: bool, interpret: bool):
    """Builds the pallas_call for residuals (scales=None), the reference-shaped
    fused backward (scales=(ss, su)), or the fused loss forward
    (reduce_loss=True: in-kernel partial reduction, no residual writes)."""
    nz, ny, nx = g.shape
    sz = pick_slab_size(g)
    n_slabs = nz // sz

    def kernel(
        s_tm1_ref,
        s_tp1_ref,
        u_tm1_ref,
        u_tp1_ref,
        s_t_hbm,
        ux_t_hbm,
        uy_t_hbm,
        uz_t_hbm,
        *out_and_scratch,
    ):
        if reduce_loss:
            (part_ref, s_buf, ux_buf, uy_buf, uz_buf, sems) = out_and_scratch
        else:
            (rs_ref, ru_ref, s_buf, ux_buf, uy_buf, uz_buf, sems) = out_and_scratch

        hbm_refs = (s_t_hbm, ux_t_hbm, uy_t_hbm, uz_t_hbm)
        bufs = (s_buf, ux_buf, uy_buf, uz_buf)
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            _start_slab(g, sz, n_slabs, i, hbm_refs, bufs, sems, slot)

        @pl.when(i + 1 < n_slabs)
        def _():
            _start_slab(g, sz, n_slabs, i + 1, hbm_refs, bufs, sems, next_slot)

        _wait_slab(g, sz, n_slabs, i, hbm_refs, bufs, sems, slot)

        s = s_buf[slot]
        u3 = (ux_buf[slot], uy_buf[slot], uz_buf[slot])
        r_sigma, r_ux, r_uy, r_uz = _slab_residuals(
            g, s, u3, s_tm1_ref[...], s_tp1_ref[...], u_tm1_ref[...], u_tp1_ref[...]
        )
        if scales is not None:
            ss, su = scales
            r_sigma = r_sigma * np.float32(ss)
            r_ux = r_ux * np.float32(su)
            r_uy = r_uy * np.float32(su)
            r_uz = r_uz * np.float32(su)
        if reduce_loss:
            # Per-PLANE partials keep the f32 accumulation segments short
            # enough to hold the 1e-7 loss doctrine (the final [2, nz] sum is
            # pairwise in XLA).
            for k in range(sz):
                part_ref[0, i * sz + k] = jnp.sum(r_sigma[k] * r_sigma[k])
                part_ref[1, i * sz + k] = (
                    jnp.sum(r_ux[k] * r_ux[k])
                    + jnp.sum(r_uy[k] * r_uy[k])
                    + jnp.sum(r_uz[k] * r_uz[k])
                )
        else:
            rs_ref[...] = r_sigma
            ru_ref[0] = r_ux
            ru_ref[1] = r_uy
            ru_ref[2] = r_uz

    slab3 = pl.BlockSpec((sz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    slab4 = pl.BlockSpec(
        (3, sz, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [slab3, slab3, slab4, slab4, hbm, hbm, hbm, hbm]

    if reduce_loss:
        # Mosaic requires the last-two block dims to equal the array dims (or
        # be (8,128)-aligned), so partials are a [2, nz] SMEM block with a
        # constant index map; each program writes its own columns.
        out_shape = jax.ShapeDtypeStruct((2, nz), jnp.float32)
        out_specs = pl.BlockSpec((2, nz), lambda i: (0, 0), memory_space=pltpu.SMEM)
    else:
        out_shape = (
            jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((3, nz, ny, nx), jnp.float32),
        )
        out_specs = (slab3, slab4)

    scratch = [
        pltpu.VMEM((2, sz + 2, ny, nx), jnp.float32),  # sigma_t
        pltpu.VMEM((2, sz + 2, ny, nx), jnp.float32),  # ux_t
        pltpu.VMEM((2, sz + 2, ny, nx), jnp.float32),  # uy_t
        pltpu.VMEM((2, sz + 2, ny, nx), jnp.float32),  # uz_t
        pltpu.SemaphoreType.DMA((2, 4, 3)),
    ]

    flops_per_cell = 60
    return pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # in-order double buffering
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * g.num_cells,
            bytes_accessed=(12 + 4) * 4 * g.num_cells,
            transcendentals=0,
        ),
    )


def _build_plane_call(g: GridSpec, scales, reduce_loss: bool, interpret: bool):
    """Per-z-plane variant, BlockSpec-only (no manual DMA): works for any
    grid shape. The z halo is expressed by passing sigma_t / u_t channels
    three times with z index maps shifted by -1/0/+1 (wrap or clamp), at the
    cost of re-fetching the t-center fields 3x (~96 B/cell vs the slab
    kernel's ~70). Mosaic requires 128-aligned lane slices for manual HBM
    DMAs, so this is the fallback when nx % 128 != 0."""
    nz, ny, nx = g.shape

    def imap_z(dz):
        if dz == 0:
            return lambda i: (i, 0, 0)
        if g.periodic:
            return lambda i: (jax.lax.rem(i + dz + nz, nz), 0, 0)
        return lambda i: (jnp.clip(i + dz, 0, nz - 1), 0, 0)

    def plane(dz):
        return pl.BlockSpec((1, ny, nx), imap_z(dz), memory_space=pltpu.VMEM)

    vec_plane = pl.BlockSpec(
        (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )

    def kernel(
        s_tm1_ref,
        s_tp1_ref,
        u_tm1_ref,
        u_tp1_ref,
        s_m,
        s_c,
        s_p,
        uxm,
        uxc,
        uxp,
        uym,
        uyc,
        uyp,
        uzm,
        uzc,
        uzp,
        *outs,
    ):
        s = jnp.concatenate([s_m[...], s_c[...], s_p[...]], axis=0)
        u3 = (
            jnp.concatenate([uxm[...], uxc[...], uxp[...]], axis=0),
            jnp.concatenate([uym[...], uyc[...], uyp[...]], axis=0),
            jnp.concatenate([uzm[...], uzc[...], uzp[...]], axis=0),
        )
        r_sigma, r_ux, r_uy, r_uz = _slab_residuals(
            g, s, u3, s_tm1_ref[...], s_tp1_ref[...], u_tm1_ref[...], u_tp1_ref[...]
        )
        if scales is not None:
            ss, su = scales
            r_sigma = r_sigma * np.float32(ss)
            r_ux = r_ux * np.float32(su)
            r_uy = r_uy * np.float32(su)
            r_uz = r_uz * np.float32(su)
        if reduce_loss:
            part_ref = outs[0]
            i = pl.program_id(0)
            part_ref[0, i] = jnp.sum(r_sigma * r_sigma)
            part_ref[1, i] = (
                jnp.sum(r_ux * r_ux) + jnp.sum(r_uy * r_uy) + jnp.sum(r_uz * r_uz)
            )
        else:
            rs_ref, ru_ref = outs
            rs_ref[...] = r_sigma
            ru_ref[0] = r_ux
            ru_ref[1] = r_uy
            ru_ref[2] = r_uz

    in_specs = [plane(0), plane(0), vec_plane, vec_plane]
    in_specs += [plane(-1), plane(0), plane(+1)] * 4

    if reduce_loss:
        out_shape = jax.ShapeDtypeStruct((2, nz), jnp.float32)
        out_specs = pl.BlockSpec((2, nz), lambda i: (0, 0), memory_space=pltpu.SMEM)
    else:
        out_shape = (
            jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((3, nz, ny, nx), jnp.float32),
        )
        out_specs = (plane(0), vec_plane)

    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=60 * g.num_cells,
            bytes_accessed=(20 + 4) * 4 * g.num_cells,
            transcendentals=0,
        ),
    )


def _run_fused(g, fields: FieldSnapshots, scales, reduce_loss, interpret):
    if interpret is None:
        interpret = _default_interpret()
    # The slab kernel's manual HBM DMAs need 128-aligned lane slices.
    use_slab = g.nx % 128 == 0
    common = (fields.sigma_tm1, fields.sigma_tp1, fields.u_tm1, fields.u_tp1)
    ux, uy, uz = fields.u_t[0], fields.u_t[1], fields.u_t[2]
    if use_slab:
        # NOTE: the packed kernel (residuals_fused_packed) is ~2x faster than
        # this multi-stream kernel, but packing separate FieldSnapshots costs
        # more than it saves; it pays off when the producer already emits the
        # packed layout (pallas.mlp generate_fields_fused_packed).
        call = _build_fused_call(g, scales, reduce_loss, interpret)
        return call(*common, fields.sigma_t, ux, uy, uz)
    call = _build_plane_call(g, scales, reduce_loss, interpret)
    # The -1/0/+1 z-shifted specs each receive the same array.
    return call(
        *common,
        fields.sigma_t,
        fields.sigma_t,
        fields.sigma_t,
        ux,
        ux,
        ux,
        uy,
        uy,
        uy,
        uz,
        uz,
        uz,
    )


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused(g: GridSpec, fields: FieldSnapshots, interpret=None):
    """Fused residuals: (R_sigma [nz,ny,nx], R_u [3,nz,ny,nx]).

    Forward = one-pass Pallas kernel (the analogue of k_residuals_fused,
    src/phys_cuda_fused.cu:33-100). Backward = the true field adjoint taken
    from the differentiable ops/ path, so gradients flow to whatever produced
    the fields (e.g. MLP weights) — beyond the reference's residual-space VJP.
    """
    rs, ru = _run_fused(g, fields, None, False, interpret)
    return rs, ru


def _residuals_fused_fwd(g, fields, interpret):
    out = residuals_fused(g, fields, interpret)
    return out, fields


def _residuals_fused_bwd(g, interpret, fields, cotangents):
    _, vjp = jax.vjp(lambda f: ops_stencil.residuals(g, f), fields)
    (grads,) = vjp(cotangents)
    return (grads,)


residuals_fused.defvjp(_residuals_fused_fwd, _residuals_fused_bwd)


def loss_backward_fused(
    g: GridSpec, w: PhysWeights, fields: FieldSnapshots, interpret=None
):
    """Reference-shaped fused backward: recompute residuals from raw fields
    and scale by 2w/N in one kernel, never materializing R (the analogue of
    k_backward_fused, src/phys_cuda_fused.cu:102-172).

    Returns (g_sigma [nz,ny,nx], g_u [3,nz,ny,nx]) — gradients w.r.t. the
    residuals, matching include/phys.h:54 semantics.
    """
    n = np.float32(g.num_cells)
    ss = float(np.float32(2.0) * np.float32(w.w_sigma) / n)
    su = float(np.float32(2.0) * np.float32(w.w_u) / n)
    return _run_fused(g, fields, (ss, su), False, interpret)


def _scale_partials(g: GridSpec, w, parts):
    """[2, nz] raw per-plane partials -> (L_sigma, L_u): one shared scaling
    site for every fused-loss variant (plain/packed/flat), kept in lock-step
    with ops/loss.py's weight and 1/N conventions."""
    sums = jnp.sum(parts, axis=1)
    inv_n = np.float32(1.0 / g.num_cells)
    return (
        np.float32(w.w_sigma) * sums[0] * inv_n,
        np.float32(w.w_u) * sums[1] * inv_n,
    )


def loss_forward_fused(
    g: GridSpec, w: PhysWeights, fields: FieldSnapshots, interpret=None
):
    """Fused loss forward with in-kernel partial reduction — the kernel the
    reference planned but never built (docs/PLAN_FUSED_PHYS_LOSS.md:59).

    The kernel reduces each z-PLANE's residual squares into a [2, nz]
    partial array (one partial per plane keeps the f32 accumulation segments
    short — the 1e-7 loss doctrine relies on this); the tiny array is summed
    outside in a deterministic order. Residuals are never written to HBM: 16
    bytes/cell of write traffic saved vs the staged loss path. Returns
    (L_sigma, L_u).
    """
    parts = _run_fused(g, fields, None, True, interpret)
    return _scale_partials(g, w, parts)


# ---------------------------------------------------------------------------
# Packed-layout kernel (the fast path)
# ---------------------------------------------------------------------------
#
# Probing this hardware showed the BlockSpec pipeline tops out near ~850 GB/s
# when a kernel streams many separate arrays (12 inputs + 4 outputs), while a
# single-stream pipeline reaches multi-TB/s. The packed kernel therefore
# carries ALL six input fields as one [12, nz, ny, nx] array (channel order
# below) staged with ONE manual DMA per interior slab, and emits the packed
# [4, nz, ny, nx] residual block.

#: Channel order of the packed input array.
PACKED_ORDER = (
    "sigma_tm1", "sigma_t", "sigma_tp1",
    "ux_tm1", "uy_tm1", "uz_tm1",
    "ux_t", "uy_t", "uz_t",
    "ux_tp1", "uy_tp1", "uz_tp1",
)


def pack_fields(fields: FieldSnapshots) -> jnp.ndarray:
    """FieldSnapshots -> packed [12, nz, ny, nx] (PACKED_ORDER)."""
    return jnp.concatenate(
        [
            fields.sigma_tm1[None],
            fields.sigma_t[None],
            fields.sigma_tp1[None],
            fields.u_tm1,
            fields.u_t,
            fields.u_tp1,
        ],
        axis=0,
    )


def unpack_fields(packed: jnp.ndarray) -> FieldSnapshots:
    return FieldSnapshots(
        sigma_tm1=packed[0],
        sigma_t=packed[1],
        sigma_tp1=packed[2],
        u_tm1=packed[3:6],
        u_t=packed[6:9],
        u_tp1=packed[9:12],
    )


def pick_packed_slab(g: GridSpec, max_sz: int = 16, plane_cells: int | None = None) -> int:
    """Largest divisor of nz <= max_sz fitting 2x(12*(sz+2)) staging planes +
    2x(4*sz) output planes in the VMEM budget. plane_cells overrides the
    per-plane cell count (the padded-lane kernel's planes are ny*px)."""
    plane_bytes = (plane_cells if plane_cells is not None else g.ny * g.nx) * 4
    best = 1
    for sz in range(1, max_sz + 1):
        if g.nz % sz != 0:
            continue
        planes = 24 * (sz + 2) + 8 * sz
        if planes * plane_bytes <= _VMEM_BUDGET:
            best = sz
    return best


def _build_packed_call(
    g: GridSpec,
    scales,
    reduce_loss: bool,
    interpret: bool,
    dtype=jnp.float32,
    flat: bool = False,
    out_dtype=None,
    split_streams: bool = False,
    pad_lanes: bool = False,
):
    """out_dtype: residual output dtype (defaults to dtype). f32 inputs with
    bf16 outputs cut the op's traffic 64 -> 56 B/cell — a separately-labeled
    mixed arm (round-2 VERDICT #4). split_streams: the 12 channels arrive as
    TWO independent [6, nz, py, px] HBM arrays with independent DMAs — the
    two-source-array engine-parallelism experiment (distinct from the failed
    same-array semaphore split). pad_lanes: HALO-padded lanes — planes are
    [ny, px] (px the next 128 multiple of nx) with the true field at lanes
    [off, off+nx) and each side's pad lanes holding the wrap/clamp x
    continuation (pack_fields_pad builds this). Every +-1 x-shift is then a
    PURE lane roll — true-lane outputs read correct neighbor values with
    ZERO boundary selects, the flagship kernel's exact body — at the cost of
    (px-nx)/nx extra DMA traffic. (The intermediate design — junk end lanes
    + _shift_last's nx_true edge selects — measured 41.0 us at 96x96x64 vs
    this form's 28.5 and the flat kernel's 39.5: the per-shift select pair
    cost 12.5 us, more than the whole pad-traffic budget. See DESIGN.md.)"""
    nz, ny, nx = g.shape
    out_dtype = dtype if out_dtype is None else out_dtype
    if flat:
        # Flat layout: planes are [R, 128] lane rows (see flat_rows) — the
        # route to lane-aligned manual DMAs when nx % 128 != 0.
        py, px = (ny * nx) // 128, 128
        shifters = make_flat_shifters(g)
    elif pad_lanes:
        py, px = ny, padded_px(g)
        off = (px - nx) // 2
        per = g.periodic

        def _roll_x(v, d):
            n = v.shape[-1]
            return pltpu.roll(v, (n - d) % n, axis=v.ndim - 1)

        shifters = (_roll_x, lambda v, d: _shift_sub(v, d, per))
    else:
        py, px = ny, nx
        shifters = None
    sz = pick_packed_slab(g, plane_cells=py * px)
    n_slabs = nz // sz
    streams = 2 if split_streams else 1
    chs = 12 // streams

    def copies_interior(slab, buf, sems, hbms, slot):
        z0 = slab * sz
        return [
            pltpu.make_async_copy(
                hbms[k].at[:, pl.ds(z0 - 1, sz + 2)],
                buf.at[slot, pl.ds(k * chs, chs)],
                sems.at[slot, 3 * k],
            )
            for k in range(streams)
        ]

    def copies_edge(slab, buf, sems, hbms, slot):
        out = []
        for k in range(streams):
            out += _packed_edge(
                g, sz, slab, hbms[k], buf, sems, slot,
                ch0=k * chs, nch=chs, sem0=3 * k,
            )
        return out

    def start(slab, buf, sems, hbms, slot):
        if n_slabs <= 2:  # every slab touches a boundary; sz+2 may exceed nz
            for c in copies_edge(slab, buf, sems, hbms, slot):
                c.start()
            return
        is_edge = jnp.logical_or(slab == 0, slab == n_slabs - 1)

        @pl.when(jnp.logical_not(is_edge))
        def _():
            for c in copies_interior(slab, buf, sems, hbms, slot):
                c.start()

        @pl.when(is_edge)
        def _():
            for c in copies_edge(slab, buf, sems, hbms, slot):
                c.start()

    def wait(slab, buf, sems, hbms, slot):
        if n_slabs <= 2:
            for c in copies_edge(slab, buf, sems, hbms, slot):
                c.wait()
            return
        is_edge = jnp.logical_or(slab == 0, slab == n_slabs - 1)

        @pl.when(jnp.logical_not(is_edge))
        def _():
            for c in copies_interior(slab, buf, sems, hbms, slot):
                c.wait()

        @pl.when(is_edge)
        def _():
            for c in copies_edge(slab, buf, sems, hbms, slot):
                c.wait()

    def kernel(*refs):
        hbms = refs[:streams]
        if reduce_loss:
            part_ref, buf, sems = refs[streams:]
        else:
            out_ref, buf, sems = refs[streams:]
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            start(i, buf, sems, hbms, slot)

        @pl.when(i + 1 < n_slabs)
        def _():
            start(i + 1, buf, sems, hbms, next_slot)

        wait(i, buf, sems, hbms, slot)

        slab = buf[slot]  # [12, sz+2, py, px]
        if dtype != jnp.float32:
            slab = slab.astype(jnp.float32)
        r_sigma, r_ux, r_uy, r_uz = _slab_residuals(
            g,
            slab[1],
            (slab[6], slab[7], slab[8]),
            slab[0, 1:-1],
            slab[2, 1:-1],
            (slab[3, 1:-1], slab[4, 1:-1], slab[5, 1:-1]),
            (slab[9, 1:-1], slab[10, 1:-1], slab[11, 1:-1]),
            shifters=shifters,
        )
        if reduce_loss and pad_lanes:
            # Pad lanes (outside [off, off+nx)) carry halo/garbage values;
            # zero them out of the sums.
            lane = jax.lax.broadcasted_iota(jnp.int32, r_sigma.shape, 2)
            keep = jnp.logical_and(lane >= off, lane < off + nx)
            zero = jnp.float32(0.0)
            r_sigma = jnp.where(keep, r_sigma, zero)
            r_ux = jnp.where(keep, r_ux, zero)
            r_uy = jnp.where(keep, r_uy, zero)
            r_uz = jnp.where(keep, r_uz, zero)
        if scales is not None:
            ss, su = scales
            r_sigma = r_sigma * np.float32(ss)
            r_ux = r_ux * np.float32(su)
            r_uy = r_uy * np.float32(su)
            r_uz = r_uz * np.float32(su)
        if reduce_loss:
            for k in range(sz):
                part_ref[0, i * sz + k] = jnp.sum(r_sigma[k] * r_sigma[k])
                part_ref[1, i * sz + k] = (
                    jnp.sum(r_ux[k] * r_ux[k])
                    + jnp.sum(r_uy[k] * r_uy[k])
                    + jnp.sum(r_uz[k] * r_uz[k])
                )
        else:
            out_ref[0] = r_sigma.astype(out_dtype)
            out_ref[1] = r_ux.astype(out_dtype)
            out_ref[2] = r_uy.astype(out_dtype)
            out_ref[3] = r_uz.astype(out_dtype)

    if reduce_loss:
        out_shape = jax.ShapeDtypeStruct((2, nz), jnp.float32)
        out_specs = pl.BlockSpec((2, nz), lambda i: (0, 0), memory_space=pltpu.SMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((4, nz, py, px), out_dtype)
        out_specs = pl.BlockSpec(
            (4, sz, py, px), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        )

    in_item = jnp.dtype(dtype).itemsize
    out_item = jnp.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * streams,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 12, sz + 2, py, px), dtype),
            pltpu.SemaphoreType.DMA((2, 3 * streams)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # our manual double-buffer logic requires in-order grid execution
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * g.num_cells,
            bytes_accessed=(12 * in_item + 4 * out_item) * g.num_cells,
            transcendentals=0,
        ),
    )


def _packed_edge(
    g: GridSpec, sz: int, slab, hbm, buf, sems, slot,
    ch0: int = 0, nch: int = 12, sem0: int = 0,
):
    """Edge slabs: main block + two wrap/clamp halo planes (3 DMAs).
    ch0/nch/sem0 select the channel range and semaphore base for the
    split-stream experiment (two independent source arrays)."""
    nz = g.nz
    z0 = slab * sz
    if g.periodic:
        zlo = jax.lax.rem(z0 - 1 + nz, nz)
        zhi = jax.lax.rem(z0 + sz, nz)
    else:
        zlo = jnp.maximum(z0 - 1, 0)
        zhi = jnp.minimum(z0 + sz, nz - 1)
    chd = pl.ds(ch0, nch)
    return [
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(z0, sz)], buf.at[slot, chd, pl.ds(1, sz)],
            sems.at[slot, sem0],
        ),
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(zlo, 1)], buf.at[slot, chd, pl.ds(0, 1)],
            sems.at[slot, sem0 + 1],
        ),
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(zhi, 1)],
            buf.at[slot, chd, pl.ds(sz + 1, 1)],
            sems.at[slot, sem0 + 2],
        ),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_packed(g: GridSpec, packed: jnp.ndarray, interpret=None):
    """Fused residuals on the packed layout: [12, nz, ny, nx] -> [4, nz, ny, nx]
    ([R_sigma, R_ux, R_uy, R_uz]). The fast path on 128-aligned nx (one input
    DMA stream); differentiable via the ops-path field adjoint. Unaligned nx
    routes through the flat-layout kernel (plus reshapes), or the staged ops
    when ny*nx % 128 != 0."""
    if interpret is None:
        interpret = _default_interpret()
    if g.nx % 128 != 0 and not interpret:
        if flat_rows(g) is not None:
            flat = residuals_fused_flat(g, grid_to_flat(g, packed), interpret)
            return flat_to_grid(g, flat)
        return _packed_residuals_ops(g, packed)
    call = _build_packed_call(g, None, False, interpret)
    return call(packed)


def _packed_residuals_ops(g: GridSpec, packed: jnp.ndarray) -> jnp.ndarray:
    rs, ru = ops_stencil.residuals(g, unpack_fields(packed))
    return jnp.concatenate([rs[None], ru], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_packed_bf16(g: GridSpec, packed_bf16, interpret=None):
    """Mixed-precision residual kernel: bfloat16 fields in, f32 stencil
    arithmetic in-kernel, bfloat16 residuals out — halves the HBM traffic
    (the op is bandwidth-bound). Tolerance class 1e-3 amplified by the
    1/h stencil factors (the reference's planned M4 mixed-precision mode,
    REQUIREMENT.md:124-130). Differentiable (round 3): the backward is the
    f32 field adjoint of the staged op on the upcast inputs, with the
    input cotangent rounded back to bf16 (the exact VJP of
    residuals(cast_f32(x)) followed by the output cast — output rounding
    is straight-through, like every bf16 matmul tier here)."""
    if interpret is None:
        interpret = _default_interpret()
    if g.nx % 128 != 0 and not interpret:
        return _packed_residuals_ops(g, packed_bf16.astype(jnp.float32)).astype(
            jnp.bfloat16
        )
    call = _build_packed_call(g, None, False, interpret, dtype=jnp.bfloat16)
    return call(packed_bf16)


def _rfp16_fwd(g, packed_bf16, interpret):
    return residuals_fused_packed_bf16(g, packed_bf16, interpret), packed_bf16


def _rfp16_bwd(g, interpret, packed_bf16, cot):
    _, vjp = jax.vjp(
        lambda p: _packed_residuals_ops(g, p.astype(jnp.float32)).astype(
            jnp.bfloat16
        ),
        packed_bf16,
    )
    (d_packed,) = vjp(cot)
    return (d_packed,)


residuals_fused_packed_bf16.defvjp(_rfp16_fwd, _rfp16_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_packed_mixed_out(g: GridSpec, packed, interpret=None):
    """f32 fields in, f32 arithmetic, bfloat16 residuals OUT: trims the op's
    traffic 64 -> 56 B/cell while keeping exact-f32 inputs (round-2 VERDICT
    #4's separately-labeled mixed arm). Output tolerance class: bf16
    rounding of exact-f32 residuals (~1e-3 relative). Differentiable
    (round 3): f32 field adjoint with the output cast's straight-through
    cotangent upcast."""
    if interpret is None:
        interpret = _default_interpret()
    if g.nx % 128 != 0 and not interpret:
        return _packed_residuals_ops(g, packed).astype(jnp.bfloat16)
    call = _build_packed_call(g, None, False, interpret, out_dtype=jnp.bfloat16)
    return call(packed)


def _rfpmo_fwd(g, packed, interpret):
    return residuals_fused_packed_mixed_out(g, packed, interpret), packed


def _rfpmo_bwd(g, interpret, packed, cot):
    _, vjp = jax.vjp(
        lambda p: _packed_residuals_ops(g, p).astype(jnp.bfloat16), packed
    )
    (d_packed,) = vjp(cot)
    return (d_packed,)


residuals_fused_packed_mixed_out.defvjp(_rfpmo_fwd, _rfpmo_bwd)


def residuals_fused_packed_split(g: GridSpec, sigma6, u6, interpret=None):
    """The split-stream experiment arm: the 12 channels arrive as TWO
    independent HBM arrays ([6, nz, ny, nx] each: the three sigma slices +
    u_tm1, and u_t + u_tp1) with independent per-slab DMAs — probes whether
    two source arrays reach DMA-engine parallelism that one array's
    semaphore split (a measured round-2 negative) could not. Same math and
    outputs as residuals_fused_packed."""
    if interpret is None:
        interpret = _default_interpret()
    assert g.nx % 128 == 0, "split-stream arm is packed-layout only"
    call = _build_packed_call(g, None, False, interpret, split_streams=True)
    return call(sigma6, u6)


def _rfp_fwd(g, packed, interpret):
    return residuals_fused_packed(g, packed, interpret), packed


def _rfp_bwd(g, interpret, packed, cot):
    _, vjp = jax.vjp(lambda p: _packed_residuals_ops(g, p), packed)
    (d_packed,) = vjp(cot)
    return (d_packed,)


residuals_fused_packed.defvjp(_rfp_fwd, _rfp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 3))
def loss_forward_fused_packed(
    g: GridSpec, w: PhysWeights, packed: jnp.ndarray, interpret=None
):
    """Fused loss forward on the packed layout (in-kernel reduction, no
    residual writes). Differentiable: the backward is the exact field
    adjoint of the staged loss. Unaligned nx routes through the flat-layout
    kernel, or falls back to the staged ops when ny*nx % 128 != 0."""
    if interpret is None:
        interpret = _default_interpret()
    if g.nx % 128 != 0 and not interpret:
        if flat_rows(g) is not None:
            return loss_forward_fused_flat(g, w, grid_to_flat(g, packed), interpret)
        from phys_autodiff_tpu.ops import loss as ops_loss

        rs, ru = ops_stencil.residuals(g, unpack_fields(packed))
        return ops_loss.loss_terms(g, w, rs, ru)
    parts = _build_packed_call(g, None, True, interpret)(packed)
    return _scale_partials(g, w, parts)


# ---------------------------------------------------------------------------
# FLAT-layout public API (the fast path for nx % 128 != 0)
# ---------------------------------------------------------------------------


def pack_fields_flat(g: GridSpec, fields: FieldSnapshots) -> jnp.ndarray:
    """FieldSnapshots -> flat-packed [12, nz, R, 128] (PACKED_ORDER channels;
    each plane a C-order reshape of [ny, nx] into R = ny*nx/128 lane rows —
    bit-identical to the reference's flat x-fastest layout)."""
    r = flat_rows(g)
    assert r is not None, "flat layout needs ny*nx % 128 == 0"
    return pack_fields(fields).reshape(12, g.nz, r, 128)


def flat_to_grid(g: GridSpec, flat: jnp.ndarray) -> jnp.ndarray:
    """[C, nz, R, 128] -> [C, nz, ny, nx] (inverse of the flat reshape)."""
    return flat.reshape(flat.shape[0], g.nz, g.ny, g.nx)


def grid_to_flat(g: GridSpec, arr: jnp.ndarray) -> jnp.ndarray:
    """[C, nz, ny, nx] -> [C, nz, R, 128]."""
    r = flat_rows(g)
    assert r is not None, "flat layout needs ny*nx % 128 == 0"
    return arr.reshape(arr.shape[0], g.nz, r, 128)


def _flat_residuals_ops(g: GridSpec, flat: jnp.ndarray) -> jnp.ndarray:
    rs, ru = ops_stencil.residuals(g, unpack_fields(flat_to_grid(g, flat)))
    return grid_to_flat(g, jnp.concatenate([rs[None], ru], axis=0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_flat(g: GridSpec, flat: jnp.ndarray, interpret=None):
    """Fused residuals on the flat layout: [12, nz, R, 128] ->
    [4, nz, R, 128] ([R_sigma, R_ux, R_uy, R_uz] flat planes). One manual
    DMA per interior slab like the packed kernel, but lane-aligned at ANY
    nx with ny*nx % 128 == 0 — the fast path for the reference's unaligned
    benchmark grids (64^3, 96x96x64). Differentiable via the ops-path field
    adjoint."""
    if interpret is None:
        interpret = _default_interpret()
    call = _build_packed_call(g, None, False, interpret, flat=True)
    return call(flat)


def _rff_fwd(g, flat, interpret):
    return residuals_fused_flat(g, flat, interpret), flat


def _rff_bwd(g, interpret, flat, cot):
    _, vjp = jax.vjp(lambda p: _flat_residuals_ops(g, p), flat)
    (d_flat,) = vjp(cot)
    return (d_flat,)


residuals_fused_flat.defvjp(_rff_fwd, _rff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_flat_bf16(g: GridSpec, flat_bf16, interpret=None):
    """bf16-I/O variant of residuals_fused_flat (f32 in-kernel arithmetic,
    1e-3 tolerance class). Differentiable (round 3): same
    upcast-adjoint-recast VJP as residuals_fused_packed_bf16."""
    if interpret is None:
        interpret = _default_interpret()
    call = _build_packed_call(g, None, False, interpret, dtype=jnp.bfloat16, flat=True)
    return call(flat_bf16)


def _rff16_fwd(g, flat_bf16, interpret):
    return residuals_fused_flat_bf16(g, flat_bf16, interpret), flat_bf16


def _rff16_bwd(g, interpret, flat_bf16, cot):
    _, vjp = jax.vjp(
        lambda p: _flat_residuals_ops(g, p.astype(jnp.float32)).astype(
            jnp.bfloat16
        ),
        flat_bf16,
    )
    (d_flat,) = vjp(cot)
    return (d_flat,)


residuals_fused_flat_bf16.defvjp(_rff16_fwd, _rff16_bwd)


# ---------------------------------------------------------------------------
# PADDED-LANE public API (round-5 arm for unaligned nx: halo pads in lanes)
# ---------------------------------------------------------------------------
#
# The flat layout makes every DMA lane-aligned at zero traffic overhead, but
# its cyclic-shift stencils cost select chains that grow as nx misaligns
# (round-4 matrix: 65.8 ps/cell at nx=96 vs the packed kernel's 35.4 at
# nx=128). The padded-lane arm takes the opposite trade: pad nx up to the
# next 128 multiple and keep the packed kernel's roll-based shifts. The pad
# lanes are split across BOTH sides of the true field and hold its wrap (or
# clamp) x-continuation, so every +-1 lane roll reads a correct neighbor
# value at every true lane — zero boundary selects, the flagship kernel's
# exact body. Worth it exactly when pad_ratio * packed_per_cell <
# flat_per_cell: at nx=96 (ratio 4/3, measured 28.5 vs 39.5 us) yes; at
# nx=64 (ratio 2, measured 27.2-vs-16.4-class) no.


def padded_px(g: GridSpec) -> int | None:
    """Padded lane extent (next 128 multiple of nx) for unaligned grids,
    or None when nx is already 128-aligned."""
    return None if g.nx % 128 == 0 else -(-g.nx // 128) * 128


def pad_off(g: GridSpec) -> int:
    """Lane offset of the true field inside a halo-padded plane."""
    px = padded_px(g)
    assert px is not None, "padded layout is for nx % 128 != 0"
    return (px - g.nx) // 2


def pack_fields_pad(g: GridSpec, fields: FieldSnapshots) -> jnp.ndarray:
    """FieldSnapshots -> halo-padded packed [12, nz, ny, px] (PACKED_ORDER;
    px = next 128 multiple of nx). The true field sits at lanes
    [off, off+nx); each side's pad lanes carry its periodic-wrap (or clamp
    edge) x-continuation — the invariant residuals_fused_padlanes relies on
    for select-free stencil rolls."""
    px = padded_px(g)
    assert px is not None, "padded layout is for nx % 128 != 0"
    off = pad_off(g)
    mode = "wrap" if g.periodic else "edge"
    return jnp.pad(
        pack_fields(fields),
        ((0, 0), (0, 0), (0, 0), (off, px - g.nx - off)),
        mode=mode,
    )


def pad_to_grid(g: GridSpec, arr: jnp.ndarray) -> jnp.ndarray:
    """[C, nz, ny, px] -> [C, nz, ny, nx]: extract the true lanes."""
    off = pad_off(g)
    return arr[..., off : off + g.nx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_padlanes(g: GridSpec, padded: jnp.ndarray, interpret=None):
    """Fused residuals on the halo-padded layout: [12, nz, ny, px] ->
    [4, nz, ny, px]. Requires pack_fields_pad's invariant (pad lanes = the
    true field's wrap/clamp x-continuation); true lanes [off, off+nx) then
    match the packed/flat/staged arms bit-for-bit (identical per-element
    arithmetic, zero boundary selects); pad-lane outputs are unspecified.
    Differentiable via the ops-path field adjoint (pad-lane output
    cotangents are dropped; pad-lane input cotangents are zero — the VJP of
    the pad-rebuilt-each-call composition the contract implies)."""
    if interpret is None:
        interpret = _default_interpret()
    call = _build_packed_call(g, None, False, interpret, pad_lanes=True)
    return call(padded)


def _rfpad_fwd(g, padded, interpret):
    return residuals_fused_padlanes(g, padded, interpret), padded


def _rfpad_bwd(g, interpret, padded, cot):
    _, vjp = jax.vjp(
        lambda p: _packed_residuals_ops(g, pad_to_grid(g, p)), padded
    )
    (d_padded,) = vjp(pad_to_grid(g, cot))
    return (d_padded,)


residuals_fused_padlanes.defvjp(_rfpad_fwd, _rfpad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def residuals_fused_padlanes_bf16(g: GridSpec, padded_bf16, interpret=None):
    """bf16-I/O variant of residuals_fused_padlanes (f32 in-kernel
    arithmetic, 1e-3 tolerance class; same halo-pad invariant — build the
    input as pack_fields_pad(...).astype(bfloat16) so the pad lanes are the
    ROUNDED continuation of the true lanes). Differentiable with the same
    upcast-adjoint-recast VJP as the other bf16 tiers."""
    if interpret is None:
        interpret = _default_interpret()
    call = _build_packed_call(
        g, None, False, interpret, dtype=jnp.bfloat16, pad_lanes=True
    )
    return call(padded_bf16)


def _rfpad16_fwd(g, padded_bf16, interpret):
    return residuals_fused_padlanes_bf16(g, padded_bf16, interpret), padded_bf16


def _rfpad16_bwd(g, interpret, padded_bf16, cot):
    _, vjp = jax.vjp(
        lambda p: _packed_residuals_ops(
            g, pad_to_grid(g, p).astype(jnp.float32)
        ).astype(jnp.bfloat16),
        padded_bf16,
    )
    (d_padded,) = vjp(pad_to_grid(g, cot))
    return (d_padded,)


residuals_fused_padlanes_bf16.defvjp(_rfpad16_fwd, _rfpad16_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 3))
def loss_forward_fused_padlanes(
    g: GridSpec, w: PhysWeights, padded: jnp.ndarray, interpret=None
):
    """Fused loss forward on the halo-padded layout (in-kernel per-plane
    reduction; pad lanes are masked out of the sums inside the kernel)."""
    if interpret is None:
        interpret = _default_interpret()
    parts = _build_packed_call(g, None, True, interpret, pad_lanes=True)(padded)
    return _scale_partials(g, w, parts)


def _lfpad_fwd(g, w, padded, interpret):
    return loss_forward_fused_padlanes(g, w, padded, interpret), padded


def _lfpad_bwd(g, w, interpret, padded, cot):
    def staged(p):
        rs, ru = ops_stencil.residuals(g, unpack_fields(pad_to_grid(g, p)))
        from phys_autodiff_tpu.ops import loss as ops_loss

        return ops_loss.loss_terms(g, w, rs, ru)

    _, vjp = jax.vjp(staged, padded)
    (d_padded,) = vjp(cot)
    return (d_padded,)


loss_forward_fused_padlanes.defvjp(_lfpad_fwd, _lfpad_bwd)


def loss_backward_fused_packed(
    g: GridSpec, w: PhysWeights, packed: jnp.ndarray, interpret=None
):
    """Reference-shaped fused backward on the PACKED layout: recompute
    residuals and scale by 2w/N in one kernel -> [4, nz, ny, nx] (the
    cuda_phys_loss_backward_fused analogue, src/phys_cuda_fused.cu:286-339;
    round-2 VERDICT missing #5 — the snapshot and flat layouts had this,
    packed did not). Unaligned nx routes through the flat kernel."""
    if interpret is None:
        interpret = _default_interpret()
    if g.nx % 128 != 0 and not interpret:
        if flat_rows(g) is not None:
            return flat_to_grid(
                g, loss_backward_fused_flat(g, w, grid_to_flat(g, packed), interpret)
            )
        from phys_autodiff_tpu.ops import loss as ops_loss

        rs, ru = ops_stencil.residuals(g, unpack_fields(packed))
        gs, gu = ops_loss.loss_backward(g, w, rs, ru)
        return jnp.concatenate([gs[None], gu], axis=0)
    n = np.float32(g.num_cells)
    ss = float(np.float32(2.0) * np.float32(w.w_sigma) / n)
    su = float(np.float32(2.0) * np.float32(w.w_u) / n)
    call = _build_packed_call(g, (ss, su), False, interpret)
    return call(packed)


def loss_backward_fused_flat(
    g: GridSpec, w: PhysWeights, flat: jnp.ndarray, interpret=None
):
    """Reference-shaped fused backward on the flat layout: recompute
    residuals and scale by 2w/N in one kernel -> [4, nz, R, 128]."""
    if interpret is None:
        interpret = _default_interpret()
    n = np.float32(g.num_cells)
    ss = float(np.float32(2.0) * np.float32(w.w_sigma) / n)
    su = float(np.float32(2.0) * np.float32(w.w_u) / n)
    call = _build_packed_call(g, (ss, su), False, interpret, flat=True)
    return call(flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 3))
def loss_forward_fused_flat(
    g: GridSpec, w: PhysWeights, flat: jnp.ndarray, interpret=None
):
    """Fused loss forward on the flat layout (in-kernel per-plane partial
    reduction, residuals never written to HBM). Differentiable via the
    staged-loss field adjoint."""
    if interpret is None:
        interpret = _default_interpret()
    parts = _build_packed_call(g, None, True, interpret, flat=True)(flat)
    return _scale_partials(g, w, parts)


def _lff_fwd(g, w, flat, interpret):
    return loss_forward_fused_flat(g, w, flat, interpret), flat


def _lff_bwd(g, w, interpret, flat, cot):
    def staged(p):
        rs, ru = ops_stencil.residuals(g, unpack_fields(flat_to_grid(g, p)))
        from phys_autodiff_tpu.ops import loss as ops_loss

        return ops_loss.loss_terms(g, w, rs, ru)

    _, vjp = jax.vjp(staged, flat)
    (d_flat,) = vjp(cot)
    return (d_flat,)


loss_forward_fused_flat.defvjp(_lff_fwd, _lff_bwd)


def _lfp_fwd(g, w, packed, interpret):
    return loss_forward_fused_packed(g, w, packed, interpret), packed


def _lfp_bwd(g, w, interpret, packed, cot):
    def staged(p):
        rs, ru = ops_stencil.residuals(g, unpack_fields(p))
        from phys_autodiff_tpu.ops import loss as ops_loss

        return ops_loss.loss_terms(g, w, rs, ru)

    _, vjp = jax.vjp(staged, packed)
    (d_packed,) = vjp(cot)
    return (d_packed,)


loss_forward_fused_packed.defvjp(_lfp_fwd, _lfp_bwd)
