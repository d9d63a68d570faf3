"""Fused Pallas kernel for the semi-Lagrangian transport step.

apps/transport.py's roll+select step already avoids gathers, but XLA runs
it at ~26 us / 0.9 TB/s on the flagship grid — materializing intermediate
sweeps costs it the rest of the bandwidth. This kernel streams the grid
once at the mandatory traffic (sigma + 3 u rows in, sigma row out =
20 B/cell) with a rolling 3-row VMEM window, the same pipeline shape as
the mega kernels (pallas/mega.py):

  stage A (row L = i-1): load sigma/u row phys(L); apply the x and y
          lerp sweeps in-registers (pltpu.roll shifts + selects — the
          residual kernels' _shift_last/_shift_sub, identical boundary
          semantics); bank the swept row and its dz offsets in 3-slot
          VMEM windows.
  stage B (row d = i-2): z-lerp from the window (f_m, f, f_p are the
          three banked rows) and write the output row.

The z wrap/clamp rides the BlockSpec index map (phys(L) wraps modulo nz
or clips), exactly like the mega kernels' halo rows.

Eligibility: nx % 128 == 0 and ny % 8 == 0 (lane/sublane tiling); other
grids use the XLA step (apps/transport.transport_step — same math). The
kernel is forward-only (rollout/serving); differentiable pipelines use
the XLA step, which jax.grad handles.

Measured experiment matrix (scripts/transport_bench.py, flagship
128x96x96, us/step — 2026-08-18):

  XLA split step (apps/transport)          26.2   (20 B/cell -> 0.90 TB/s)
  plane kernel, [3,1,ny,nx] u block        40.0
  plane kernel, 3 contiguous u streams     30.6
  slab kernel (manual DMA, dbl-buffered,
    contiguous interior slabs, sz=16)      26.2   (22 B/cell -> 0.99 TB/s)
  slab + precomputed signed weights
    (no clip/abs/select passes)            36.7   (32 B/cell -> 1.03 TB/s)

Reading: every arm converges on ~1.0 TB/s effective for this 4-stream
read + 1-stream write pattern — the op is bandwidth-bound at that rate
(the pass-count experiment made it SLOWER by adding traffic), and XLA's
fused roll pipeline already achieves it. The kernel therefore TIES the
XLA step; apps/transport keeps the XLA step as the default arm and this
kernel stands as the measured bound. (The residual kernels' higher
2.25 TB/s rides a single packed 12-channel stream; packing sigma+u here
would force a per-step repack of the scan carry, costing more than it
saves.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu.pallas.residuals import _shift_last, _shift_sub
from phys_autodiff_tpu.utils.config import GridSpec


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def transport_kernel_supported(g: GridSpec) -> bool:
    return g.nx % 128 == 0 and g.ny % 8 == 0


@functools.lru_cache(maxsize=32)
def _build_transport_call(g: GridSpec, interpret: bool):
    nz, ny, nx = g.nz, g.ny, g.nx
    per = g.periodic
    inv = (1.0 / g.hx, 1.0 / g.hy, 1.0 / g.hz)

    def phys(L):
        return jax.lax.rem(L + nz, nz) if per else jnp.clip(L, 0, nz - 1)

    def slot(j):
        return jax.lax.rem(j + 9, 3)

    def kernel(dt_ref, sig_ref, ux_ref, uy_ref, uz_ref, out_ref, awin,
               dzwin):
        i = pl.program_id(0)
        dt = dt_ref[0, 0]

        # ---- stage A: xy-swept row L = i-1 ------------------------------
        s = sig_ref[0]  # [ny, nx]
        dx = jnp.clip(ux_ref[0] * (dt * inv[0]), -1.0, 1.0)
        dy = jnp.clip(uy_ref[0] * (dt * inv[1]), -1.0, 1.0)
        dz = jnp.clip(uz_ref[0] * (dt * inv[2]), -1.0, 1.0)
        # x sweep: value at (x - dx) from {x-1, x, x+1}
        nbr_x = jnp.where(dx >= 0, _shift_last(s, -1, per),
                          _shift_last(s, +1, per))
        a = s + jnp.abs(dx) * (nbr_x - s)
        # y sweep
        nbr_y = jnp.where(dy >= 0, _shift_sub(a, -1, per),
                          _shift_sub(a, +1, per))
        a = a + jnp.abs(dy) * (nbr_y - a)
        sl = slot(i)
        awin[sl] = a
        dzwin[sl] = dz

        # ---- stage B: z lerp for output row d = i-2 ----------------------
        @pl.when(i >= 2)
        def _():
            f_m = awin[slot(i - 2)]
            f = awin[slot(i - 1)]
            f_p = awin[slot(i)]
            d = dzwin[slot(i - 1)]
            nbr = jnp.where(d >= 0, f_m, f_p)
            out_ref[0] = f + jnp.abs(d) * (nbr - f)

    return pl.pallas_call(
        kernel,
        grid=(nz + 2,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ny, nx), lambda i: (phys(i - 1), 0, 0)),
            # u channels as three contiguous [nz, ny, nx] streams (a single
            # [3, 1, ny, nx] block of the channel-major array DMAs three
            # strided planes per program)
            pl.BlockSpec((1, ny, nx), lambda i: (phys(i - 1), 0, 0)),
            pl.BlockSpec((1, ny, nx), lambda i: (phys(i - 1), 0, 0)),
            pl.BlockSpec((1, ny, nx), lambda i: (phys(i - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, ny, nx), lambda i: (jnp.clip(i - 2, 0, nz - 1), 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, ny, nx), jnp.float32),  # xy-swept row window
            pltpu.VMEM((3, ny, nx), jnp.float32),  # dz row window
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * g.num_cells,
            bytes_accessed=20 * g.num_cells,
            transcendentals=0,
        ),
    )


def _transport_slab_size(g: GridSpec, max_sz: int = 16) -> int:
    best = 1
    for sz in range(1, max_sz + 1):
        if g.nz % sz == 0:
            best = sz
    return best


@functools.lru_cache(maxsize=32)
def _build_transport_slab_call(g: GridSpec, sz: int, interpret: bool):
    """Manual-DMA double-buffered slab pipeline (the residual kernels'
    recipe): each program copies a halo-extended (sz+2)-row slab of sigma
    and the three u channels HBM->VMEM (three pieces per field: wrap/clamp
    lower halo row, sz body rows, upper halo row), recomputes the x/y
    sweeps over the whole extended slab (no cross-program carries), and
    z-lerps the sz interior rows out through a pipelined BlockSpec write.
    """
    nz, ny, nx = g.nz, g.ny, g.nx
    per = g.periodic
    inv = (1.0 / g.hx, 1.0 / g.hy, 1.0 / g.hz)
    n_slabs = nz // sz

    def wrap_row(r):
        return jax.lax.rem(r + nz, nz) if per else jnp.clip(r, 0, nz - 1)

    def kernel(dt_ref, sig_hbm, ux_hbm, uy_hbm, uz_hbm, out_ref,
               bufs, sems):
        # bufs: [4, 2, sz+2, ny, nx]; sems: [2, 4, 3]
        i = pl.program_id(0)
        dt = dt_ref[0, 0]
        fields = (sig_hbm, ux_hbm, uy_hbm, uz_hbm)

        # Copy plans (started and waited under MATCHING k-predicates):
        #   interior slab: rows k*sz-1 .. k*sz+sz are contiguous in HBM ->
        #     ONE (sz+2)-row copy per field.
        #   first slab:    wrap/clamp lower halo row + (sz+1)-row body.
        #   last slab:     (sz+1)-row body + wrap/clamp upper halo row.
        # (n_slabs == 1 degenerates to the generic 3-piece plan.)
        def plan_interior(k, slot):
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(k * sz - 1, sz + 2)],
                    bufs.at[f, slot], sems.at[slot, f, 0],
                )
                for f, hbm in enumerate(fields)
            ]

        def plan_first(slot):
            ops = []
            for f, hbm in enumerate(fields):
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(wrap_row(-1), 1)],
                    bufs.at[f, slot, pl.ds(0, 1)], sems.at[slot, f, 0],
                ))
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(0, sz + 1)],
                    bufs.at[f, slot, pl.ds(1, sz + 1)], sems.at[slot, f, 1],
                ))
            return ops

        def plan_last(slot):
            ops = []
            for f, hbm in enumerate(fields):
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(nz - sz - 1, sz + 1)],
                    bufs.at[f, slot, pl.ds(0, sz + 1)], sems.at[slot, f, 0],
                ))
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(wrap_row(nz), 1)],
                    bufs.at[f, slot, pl.ds(sz + 1, 1)], sems.at[slot, f, 1],
                ))
            return ops

        def plan_single(slot):
            lo = wrap_row(-1)
            hi = wrap_row(nz)
            ops = []
            for f, hbm in enumerate(fields):
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(lo, 1)], bufs.at[f, slot, pl.ds(0, 1)],
                    sems.at[slot, f, 0],
                ))
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(0, sz)], bufs.at[f, slot, pl.ds(1, sz)],
                    sems.at[slot, f, 1],
                ))
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(hi, 1)],
                    bufs.at[f, slot, pl.ds(sz + 1, 1)], sems.at[slot, f, 2],
                ))
            return ops

        def run(k, slot, action):
            if n_slabs == 1:
                for op in plan_single(slot):
                    action(op)
                return

            @pl.when(k == 0)
            def _():
                for op in plan_first(slot):
                    action(op)

            @pl.when(k == n_slabs - 1)
            def _():
                for op in plan_last(slot):
                    action(op)

            @pl.when(jnp.logical_and(k > 0, k < n_slabs - 1))
            def _():
                for op in plan_interior(k, slot):
                    action(op)

        @pl.when(i < n_slabs)
        def _():
            run(i, jax.lax.rem(i, 2), lambda op: op.start())

        @pl.when(i >= 1)
        def _():
            k = i - 1
            slot = jax.lax.rem(k, 2)
            run(k, slot, lambda op: op.wait())
            s = bufs[0, slot]  # [sz+2, ny, nx]
            dx = jnp.clip(bufs[1, slot] * (dt * inv[0]), -1.0, 1.0)
            dy = jnp.clip(bufs[2, slot] * (dt * inv[1]), -1.0, 1.0)
            dz = jnp.clip(bufs[3, slot] * (dt * inv[2]), -1.0, 1.0)
            nbr_x = jnp.where(dx >= 0, _shift_last(s, -1, per),
                              _shift_last(s, +1, per))
            a = s + jnp.abs(dx) * (nbr_x - s)
            nbr_y = jnp.where(dy >= 0, _shift_sub(a, -1, per),
                              _shift_sub(a, +1, per))
            a = a + jnp.abs(dy) * (nbr_y - a)
            f_m, f, f_p = a[0:sz], a[1 : sz + 1], a[2 : sz + 2]
            d = dz[1 : sz + 1]
            nbr = jnp.where(d >= 0, f_m, f_p)
            out_ref[...] = f + jnp.abs(d) * (nbr - f)

    return pl.pallas_call(
        kernel,
        grid=(n_slabs + 1,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (sz, ny, nx),
            lambda i: (jnp.clip(i - 1, 0, n_slabs - 1), 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, 2, sz + 2, ny, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4, 3)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * g.num_cells,
            bytes_accessed=20 * g.num_cells,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=32)
def _build_transport_pre_call(g: GridSpec, sz: int, interpret: bool):
    """Precomputed-weights variant: the caller supplies the six signed
    offset weights xp=max(dx,0), xm=max(-dx,0), ... (frozen per rollout
    when u is), so the kernel runs NO clip/abs/select passes — per axis
    just two rolls and two FMAs:  a = s + p*(s_m - s) + m*(s_p - s).
    Trades 12 B/cell extra read traffic for ~9 fewer VPU passes — the
    A/B that established the pass-bound regime (see module docstring)."""
    nz, ny, nx = g.nz, g.ny, g.nx
    per = g.periodic
    n_slabs = nz // sz

    def wrap_row(r):
        return jax.lax.rem(r + nz, nz) if per else jnp.clip(r, 0, nz - 1)

    n_fields = 7  # sigma, xp, xm, yp, ym, zp, zm

    def kernel(sig_hbm, xp_h, xm_h, yp_h, ym_h, zp_h, zm_h, out_ref,
               bufs, sems):
        i = pl.program_id(0)
        fields = (sig_hbm, xp_h, xm_h, yp_h, ym_h, zp_h, zm_h)

        def copies(k, slot):
            lo = wrap_row(k * sz - 1)
            hi = wrap_row(k * sz + sz)
            ops = []
            for f, hbm in enumerate(fields):
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(lo, 1)], bufs.at[f, slot, pl.ds(0, 1)],
                    sems.at[slot, f, 0],
                ))
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(k * sz, sz)],
                    bufs.at[f, slot, pl.ds(1, sz)], sems.at[slot, f, 1],
                ))
                ops.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(hi, 1)],
                    bufs.at[f, slot, pl.ds(sz + 1, 1)], sems.at[slot, f, 2],
                ))
            return ops

        @pl.when(i < n_slabs)
        def _():
            for op in copies(i, jax.lax.rem(i, 2)):
                op.start()

        @pl.when(i >= 1)
        def _():
            k = i - 1
            slot = jax.lax.rem(k, 2)
            for op in copies(k, slot):
                op.wait()
            s = bufs[0, slot]
            a = s + bufs[1, slot] * (_shift_last(s, -1, per) - s) \
                  + bufs[2, slot] * (_shift_last(s, +1, per) - s)
            a = a + bufs[3, slot] * (_shift_sub(a, -1, per) - a) \
                  + bufs[4, slot] * (_shift_sub(a, +1, per) - a)
            f_m, f, f_p = a[0:sz], a[1 : sz + 1], a[2 : sz + 2]
            out_ref[...] = (
                f
                + bufs[5, slot, 1 : sz + 1] * (f_m - f)
                + bufs[6, slot, 1 : sz + 1] * (f_p - f)
            )

    return pl.pallas_call(
        kernel,
        grid=(n_slabs + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_fields,
        out_specs=pl.BlockSpec(
            (sz, ny, nx),
            lambda i: (jnp.clip(i - 1, 0, n_slabs - 1), 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_fields, 2, sz + 2, ny, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_fields, 3)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=18 * g.num_cells,
            bytes_accessed=32 * g.num_cells,
            transcendentals=0,
        ),
    )


def transport_weights(g: GridSpec, u: jnp.ndarray, dt):
    """The six signed offset-weight planes for the precomputed-weights
    kernel: (xp, xm, yp, ym, zp, zm), each [nz, ny, nx]. Compute ONCE per
    frozen-velocity rollout."""
    dt = jnp.float32(dt)
    dx = jnp.clip(u[0] * (dt / g.hx), -1.0, 1.0)
    dy = jnp.clip(u[1] * (dt / g.hy), -1.0, 1.0)
    dz = jnp.clip(u[2] * (dt / g.hz), -1.0, 1.0)
    z = jnp.float32(0.0)
    return (
        jnp.maximum(dx, z), jnp.maximum(-dx, z),
        jnp.maximum(dy, z), jnp.maximum(-dy, z),
        jnp.maximum(dz, z), jnp.maximum(-dz, z),
    )


def transport_step_fused_pre(
    g: GridSpec, sigma: jnp.ndarray, weights, interpret=None
) -> jnp.ndarray:
    """Fused step on precomputed transport_weights (frozen-u rollouts)."""
    if interpret is None:
        interpret = _default_interpret()
    assert transport_kernel_supported(g), g.shape
    call = _build_transport_pre_call(g, _transport_slab_size(g), interpret)
    return call(sigma.astype(jnp.float32), *weights)


def transport_step_fused(
    g: GridSpec,
    sigma: jnp.ndarray,
    u: jnp.ndarray,
    dt,
    interpret=None,
    variant: str = "slab",
) -> jnp.ndarray:
    """One fused transport step (identical math to
    apps/transport.transport_step; parity pinned in tests). Forward-only.
    Requires transport_kernel_supported(g). variant: "slab" (manual-DMA
    double-buffered pipeline, the fast arm) or "plane" (BlockSpec
    rolling-window; kept as the measured baseline)."""
    if interpret is None:
        interpret = _default_interpret()
    assert transport_kernel_supported(g), g.shape
    assert u.shape == (3,) + sigma.shape
    u = u.astype(jnp.float32)
    if variant == "plane":
        call = _build_transport_call(g, interpret)
    else:
        call = _build_transport_slab_call(g, _transport_slab_size(g),
                                          interpret)
    return call(
        jnp.reshape(jnp.float32(dt), (1, 1)),
        sigma.astype(jnp.float32),
        u[0],
        u[1],
        u[2],
    )


def transport_fused(g: GridSpec, sigma0, u, cfg, interpret=None):
    """Scan rollout on the fused kernel (frozen velocity field); same
    signature/returns as apps/transport.transport."""
    from phys_autodiff_tpu.apps.transport import max_cfl

    if interpret is None:
        interpret = _default_interpret()
    cfl = max_cfl(g, u, cfg.dt)

    def body(s, _):
        return transport_step_fused(g, s, u, cfg.dt, interpret), None

    out, _ = jax.lax.scan(body, sigma0, None, length=cfg.steps)
    return out, cfl
