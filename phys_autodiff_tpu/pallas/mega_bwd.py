"""The fused backward mega-kernel: loss AND parameter gradients in one pass.

TPU-native analogue of the reference's `k_backward_fused`
(src/phys_cuda_fused.cu:102-172 — recompute everything, store nothing)
extended through the MLP backward (src/mlp_cuda.cu:39-89), which the
reference never wired to the physics VJP. One Pallas kernel runs a rolling
per-z-row pipeline; at program i:

  stage 1 (logical field row L = i-2): MLP forward into a 5-row field
          window (rank-1 tables, VMEM-resident AB);
  stage 2 (logical residual row r = i-3): transport residual from the
          window, raw per-plane loss partials, and the scaled residual
          cotangents g = (2w/N) * R into a 3-row cotangent window;
  stage 3 (logical gradient row d = i-4): the hand-derived adjoint of the
          residual stencil assembles the field cotangents gy[3 slices][4 ch]
          from the windows (in-plane difference transposes with clamp edge
          corrections; z legs gathered from the neighbor rows' products),
          then the MLP backward accumulates dW2T/db2 (VMEM outputs, MXU /
          VPU) and dAB (revisited output block) and writes dCD x-partials.

Logical rows run beyond [0, nz) (wrapped for periodic, clipped for clamp),
so the periodic seam's cross-row contributions land naturally; each
(residual row, adjoint leg) pair is applied exactly once in logical space,
with clamp edge legs folded into +-2V/2h corrections at d=0 / d=nz-1.

Outside the kernel, (dAB, dCD, dW2T, db2) pull back to (W1, b1, W2, b2, t)
through jax.vjp of fold_tables_mega — exact for the kernel's own forward
formulation.

Nothing grid-sized exists in HBM in EITHER direction (the round-1 backward
kept a [3N, H] activation residual — 1.8 GB at the flagship grid); the
working set is ~18 MB of VMEM windows + the dCD x-partials (19 MB output).

Adjoint derivation (central scheme). With products P_a = u_a*gs,
Q = sigma*gs, T_{a,c} = u_a*gu_c and D^T the transpose of the central
difference:

  dsigma_t  = Dx^T(P_x) + Dy^T(P_y) + Dz^T(P_z) + gs*div(u)
  du_c,t    = gs*D_c(sigma) + sum_b gu_b*D_c(u_b)
              + D_c^T(Q) + Dx^T(T_{x,c}) + Dy^T(T_{y,c}) + Dz^T(T_{z,c})
  d(.)_tp1  = +g*inv2dt,  d(.)_tm1 = -g*inv2dt

In-plane D^T: periodic = inv2h*(roll(v,+1) - roll(v,-1)); clamp = the same
with zero fill plus -v at index 0 and +v at index n-1. Along z the
transpose becomes a gather: dF[d] += inv2hz*(V[d-1] - V[d+1]) with clamp
corrections -2*inv2hz*V[0] at d=0 and +2*inv2hz*V[nz-1] at d=nz-1.

Plane layouts: 128-aligned nx runs shaped [ny, nx] planes; unaligned grids
with ny*nx % 128 == 0 (incl. the reference's 64^3 and 96x96x64 benchmark
grids) run the FLAT [ny*nx/128, 128] layout with flat cyclic-shift
differences and transposes (_make_flat_transposes) — no padded junk lanes,
no wasted work.

Schemes: both central and upwind. The upwind advection's adjoint (stage 3's
`if upwind` branch) freezes the wind selectors s = (u > 0) at the primal and
splits each carried-field transpose into backward/forward branch weights
wb = s*(u*g), wf = (1-s)*(u*g):
    dc = ( wb - wf - S^{+1}(wb) + S^{-1}(wf) ) / h
per direction, with clamp edge rows' degenerate branches masked out; the
sigma*div(u) term keeps the central transpose in both schemes.

Restrictions: see mega_supported (plane must be 128-alignable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.ops import loss as ops_loss
from phys_autodiff_tpu.pallas.mega import (
    fold_tables_mega,
    mlp_rows_into_window,
    pick_hk,
)
from phys_autodiff_tpu.pallas.residuals import (
    _flat_cyclic_shift,
    _shift_last,
    _shift_sub,
    flat_rows,
    make_flat_shifters,
)
from phys_autodiff_tpu.utils.config import GridSpec, MLPGridConfig, PhysWeights


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def mega_flat(g: GridSpec) -> bool:
    """True when the kernel must run in the FLAT plane layout (planes as
    [ny*nx/128, 128] lane rows — residuals.py's layout for unaligned nx)."""
    return g.nx % 128 != 0


def mega_supported(g: GridSpec) -> bool:
    """The ONE eligibility predicate for the backward mega-kernel (central
    scheme, Mosaic lane/sublane alignment). Every dispatch site
    (train/loop.py, train/slab_grad.py, parallel/sharded.py, and the
    fallback below) must use this rather than re-deriving the condition.

    128-aligned nx runs the shaped [ny, nx] plane layout; unaligned grids
    with ny*nx % 128 == 0 (the reference's own 64^3 and 96x96x64 benchmark
    grids) run the FLAT layout — the same [R, 128] lane-row reinterpretation
    the forward flat kernels use, with the stencil adjoint built from flat
    cyclic-shift transposes (round-2 VERDICT #3). Both schemes are served:
    the upwind advection has its own hand-derived adjoint in stage 3
    (round-2 VERDICT #5)."""
    if g.scheme not in ("central", "upwind"):
        return False
    if g.nx % 128 == 0:
        return g.ny % 8 == 0
    return flat_rows(g) is not None and g.nx >= 3 and g.ny >= 3


def mega_fits(g: GridSpec, h: int = 128) -> bool:
    """VMEM feasibility of the backward mega-kernel at (g, H).

    The kernel keeps its dCD accumulator — one [3, H] reduction per z row,
    broadcast over the pnx lane dim so row writes stay tiled — VMEM-resident
    across the WHOLE z sweep: nz * 3 * H * pnx * 4 bytes. That is 19 MB at
    the 128x96x96 flagship but grows linearly with nz (and with nx on
    aligned grids): measured 151 MB > the 110 MB limit at nz=384, nx=256,
    H=128 (big-grid campaign, 2026-08-20). Callers that get False here
    fall back to the slab-recompute gradient (train/slab_grad.py), whose
    live memory is bounded by the slab instead of the grid — the designed
    big-N arm.

    The model mirrors the kernel's actual residents: dCD + the dAB
    window+output (2 * H * plane) + AB input window (H * plane) + the
    field/cotangent scratch (~72 planes), against a 100 MB budget (the
    kernel asks Mosaic for 110 MB; the margin absorbs Mosaic's own
    padding/double-buffering slack)."""
    plane = g.ny * g.nx
    pnx = g.nx if g.nx % 128 == 0 else 128
    dcd = g.nz * 3 * h * pnx * 4
    fixed = (3 * h * plane + 72 * plane) * 4
    return dcd + fixed <= 100 * 1024 * 1024


def _flat_xy(v, nx: int):
    """(x, y) true-grid positions of each FLAT [.., R, 128] plane element."""
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 2)
    lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    flat = rows * v.shape[-1] + lanes
    return flat % nx, flat // nx


def _make_flat_zero_shifts(g: GridSpec):
    """(zx, zy) closures on FLAT planes: zx(v, d)[x] = v at x+d, wrapping for
    periodic and ZERO-filled where x+d leaves the true grid for clamp — the
    transpose-building twin of residuals.make_flat_shifters (whose clamp
    edges duplicate instead of zeroing)."""
    nx, ny, per = g.nx, g.ny, g.periodic

    def zx(v, d):
        assert d in (1, -1)
        x, _ = _flat_xy(v, nx)
        naive = _flat_cyclic_shift(v, d)
        at_edge = (x == nx - 1) if d == 1 else (x == 0)
        edge = _flat_cyclic_shift(v, d * (1 - nx)) if per else jnp.zeros_like(v)
        return jnp.where(at_edge, edge, naive)

    def zy(v, d):
        assert d in (1, -1)
        naive = _flat_cyclic_shift(v, d * nx)
        if per:
            # the plane-cyclic shift by +-nx IS the y wrap (make_flat_shifters)
            return naive
        _, y = _flat_xy(v, nx)
        at_edge = (y == ny - 1) if d == 1 else (y == 0)
        return jnp.where(at_edge, 0.0, naive)

    return zx, zy


def _make_flat_transposes(g: GridSpec):
    """(dxt, dyt) closures: the transposes of the central x/y differences on
    FLAT [.., R, 128] planes (unscaled — callers multiply inv2h). Same math
    as _dxt/_dyt below with the shifted reads realized as flat cyclic shifts
    and the boundary handling masked in by flat-index position."""
    nx, ny, per = g.nx, g.ny, g.periodic
    zx, zy = _make_flat_zero_shifts(g)

    def dxt(v):
        out = zx(v, -1) - zx(v, +1)
        if not per:
            x, _ = _flat_xy(v, nx)
            out = (
                out
                + jnp.where(x == 0, -v, 0.0)
                + jnp.where(x == nx - 1, v, 0.0)
            )
        return out

    def dyt(v):
        out = zy(v, -1) - zy(v, +1)
        if not per:
            _, y = _flat_xy(v, nx)
            out = (
                out
                + jnp.where(y == 0, -v, 0.0)
                + jnp.where(y == ny - 1, v, 0.0)
            )
        return out

    return dxt, dyt


# Contraction strategies for the three MLP matmuls whose shapes waste the
# MXU (4-wide output rows or K=4 contractions leave >96% of the systolic
# array idle). Each can run as the naive MXU dot ("dot") or as VPU
# broadcast-FMA ("vpu"); "auto" picks the hardware-measured winner per
# precision tier. Full-kernel sweep, flagship grid 128x96x96 H=128:
#
#   dw2/da1/fwd   f32 ms   bf16 ms
#   dot dot dot    8.37     1.99   <- bf16 winner (native-rate MXU)
#   vpu dot dot    7.74     2.85
#   vpu vpu dot    4.35     3.39
#   vpu vpu vpu    3.95     3.95   <- f32 winner (-53%)
#
# f32 is VPU-bound: da1 (K=4) and fwd (4 output rows) are outer-product
# shapes, so 4 broadcast-FMAs over [hk, M] beat a ~3%-utilized MXU pass;
# for bf16 the MXU runs at 2x rate and the f32-only VPU does not.
_DW2_MODE = "auto"
_DA1_MODE = "auto"
_FWD_MODE = "auto"


def _resolve_mode(which: str, precision) -> str:
    forced = {"dw2": _DW2_MODE, "da1": _DA1_MODE, "fwd": _FWD_MODE}[which]
    if forced != "auto":
        return forced
    # Whitelist the exact-f32 tiers (consistent with pallas/mlp.py and
    # pallas/mega.py): the VPU arms are plain f32 arithmetic.
    return "vpu" if precision in ("f32", "f32_high") else "dot"


def _resolve_dw2_mode(precision) -> str:
    return _resolve_mode("dw2", precision)



def _zero_shift(v, delta: int, axis_from_end: int, periodic: bool):
    """v shifted by `delta` along the lane (-1) or sublane (-2) axis; zero
    fill for clamp mode (the transpose needs zeros, not edge duplication)."""
    shift = _shift_last if axis_from_end == -1 else _shift_sub
    if periodic:
        return shift(v, delta, True)
    s = shift(v, delta, False)
    dim = v.shape[axis_from_end]
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim + axis_from_end)
    mask = idx >= (-delta) if delta < 0 else idx < (dim - delta)
    return jnp.where(mask, s, 0.0)


def _dxt(v, inv2hx, periodic: bool):
    """Transpose of the central x-difference (see module docstring)."""
    out = _zero_shift(v, -1, -1, periodic) - _zero_shift(v, +1, -1, periodic)
    if not periodic:
        n = v.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
        out = out + jnp.where(j == 0, -v, 0.0) + jnp.where(j == n - 1, v, 0.0)
    return out * inv2hx


def _dyt(v, inv2hy, periodic: bool):
    """Transpose of the central y-difference (sublane axis)."""
    out = _zero_shift(v, -1, -2, periodic) - _zero_shift(v, +1, -2, periodic)
    if not periodic:
        n = v.shape[-2]
        j = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 2)
        out = out + jnp.where(j == 0, -v, 0.0) + jnp.where(j == n - 1, v, 0.0)
    return out * inv2hy


class _PlaneOps:
    """Plane closures + physics scalars shared by the backward mega-kernels
    (the coordinate-MLP one below and the NGP one in pallas/mega_ngp.py):
    in-plane shifts sx/sy (edge-duplicating), zero-fill shifts zx/zy (for
    transposes), flat-index position maps, and the stage-2 / stage-3 math
    builders. Pure trace-time machinery — every method is called inside a
    kernel body on VMEM-resident planes."""

    def __init__(self, g: GridSpec, w: PhysWeights):
        assert g.scheme in ("central", "upwind")
        self.g = g
        self.upwind = g.scheme == "upwind"
        self.per = g.periodic
        nz, ny, nx = g.shape
        self.nz, self.ny, self.nx = nz, ny, nx
        self.flat = mega_flat(g)
        if self.flat:
            self.pny, self.pnx = flat_rows(g), 128
            self.sx_, self.sy_ = make_flat_shifters(g)
            self._fxt, self._fyt = _make_flat_transposes(g)
            self.zx_, self.zy_ = _make_flat_zero_shifts(g)
            self.xpos = lambda v: _flat_xy(v, nx)[0]
            self.ypos = lambda v: _flat_xy(v, nx)[1]
        else:
            self.pny, self.pnx = ny, nx
            self.sx_ = lambda c, d: _shift_last(c, d, g.periodic)
            self.sy_ = lambda c, d: _shift_sub(c, d, g.periodic)
            self.zx_ = lambda v, d: _zero_shift(v, d, -1, g.periodic)
            self.zy_ = lambda v, d: _zero_shift(v, d, -2, g.periodic)
            self.xpos = lambda v: jax.lax.broadcasted_iota(
                jnp.int32, v.shape, v.ndim - 1
            )
            self.ypos = lambda v: jax.lax.broadcasted_iota(
                jnp.int32, v.shape, v.ndim - 2
            )
        self.inv2dt = np.float32(1.0 / (2.0 * float(np.float32(g.dt))))
        self.inv2hx = np.float32(1.0 / (2.0 * float(np.float32(g.hx))))
        self.inv2hy = np.float32(1.0 / (2.0 * float(np.float32(g.hy))))
        self.inv2hz = np.float32(1.0 / (2.0 * float(np.float32(g.hz))))
        self.invhx = np.float32(2.0) * self.inv2hx
        self.invhy = np.float32(2.0) * self.inv2hy
        self.invhz = np.float32(2.0) * self.inv2hz
        n_cells = np.float32(g.num_cells)
        self.ss = np.float32(2.0) * np.float32(w.w_sigma) / n_cells
        self.su = np.float32(2.0) * np.float32(w.w_u) / n_cells

    def ddx(self, c):
        return (self.sx_(c, 1) - self.sx_(c, -1)) * self.inv2hx

    def ddy(self, c):
        return (self.sy_(c, 1) - self.sy_(c, -1)) * self.inv2hy

    def dxt(self, v):
        return (
            self._fxt(v) * self.inv2hx
            if self.flat
            else _dxt(v, self.inv2hx, self.per)
        )

    def dyt(self, v):
        return (
            self._fyt(v) * self.inv2hy
            if self.flat
            else _dyt(v, self.inv2hy, self.per)
        )

    def phys_row(self, lz):
        if self.per:
            return jax.lax.rem(lz + 2 * self.nz, self.nz)
        return jnp.clip(lz, 0, self.nz - 1)

    def stage2_residuals(self, w_lo, w_mid, w_hi):
        """Transport residual for the window's middle row (12-channel field
        rows below/at/above). Returns (r_sigma, r_ux, r_uy, r_uz)."""
        inv2dt, inv2hz = self.inv2dt, self.inv2hz
        invhx, invhy, invhz = self.invhx, self.invhy, self.invhz
        sx_, sy_, ddx, ddy = self.sx_, self.sy_, self.ddx, self.ddy
        sc = w_mid[4]
        u = (w_mid[5], w_mid[6], w_mid[7])

        def ddz(ch):
            return (w_hi[ch] - w_lo[ch]) * inv2hz

        div_u = ddx(u[0]) + ddy(u[1]) + ddz(7)  # central in both schemes
        if self.upwind:
            # one-sided advection (residuals._slab_residuals upwind arm);
            # clamp z edges come out right automatically: the logical
            # halo rows are clipped copies, so (c - c_lo) vanishes at
            # row 0 exactly like the clamped one-sided difference.
            def adv(ch):
                c = w_mid[ch]
                bx = (c - sx_(c, -1)) * invhx
                fx = (sx_(c, 1) - c) * invhx
                by = (c - sy_(c, -1)) * invhy
                fy = (sy_(c, 1) - c) * invhy
                bz = (c - w_lo[ch]) * invhz
                fz = (w_hi[ch] - c) * invhz
                return (
                    u[0] * jnp.where(u[0] > 0.0, bx, fx)
                    + u[1] * jnp.where(u[1] > 0.0, by, fy)
                    + u[2] * jnp.where(u[2] > 0.0, bz, fz)
                )

            adv_s, adv_x, adv_y, adv_z = adv(4), adv(5), adv(6), adv(7)
        else:
            dux = (ddx(u[0]), ddy(u[0]), ddz(5))
            duy = (ddx(u[1]), ddy(u[1]), ddz(6))
            duz = (ddx(u[2]), ddy(u[2]), ddz(7))
            ds = (ddx(sc), ddy(sc), ddz(4))
            adv_s = u[0] * ds[0] + u[1] * ds[1] + u[2] * ds[2]
            adv_x = u[0] * dux[0] + u[1] * dux[1] + u[2] * dux[2]
            adv_y = u[0] * duy[0] + u[1] * duy[1] + u[2] * duy[2]
            adv_z = u[0] * duz[0] + u[1] * duz[1] + u[2] * duz[2]

        r_sigma = (w_mid[8] - w_mid[0]) * inv2dt + adv_s + sc * div_u
        r_ux = (w_mid[9] - w_mid[1]) * inv2dt + adv_x
        r_uy = (w_mid[10] - w_mid[2]) * inv2dt + adv_y
        r_uz = (w_mid[11] - w_mid[3]) * inv2dt + adv_z
        return r_sigma, r_ux, r_uy, r_uz

    def stage3_adjoint(self, f_lo, f_md, f_hi, g_lo, g_md, g_hi, d):
        """Field cotangents for global row d from the field window (f_*) and
        the scaled residual-cotangent window (g_*). Returns gy_rows: a
        3-tuple (slices tm1, t, tp1) of 4-tuples (sigma, ux, uy, uz) of
        planes — the hand-derived stencil adjoint (module docstring)."""
        per, nz, nx, ny = self.per, self.nz, self.nx, self.ny
        inv2dt, inv2hz = self.inv2dt, self.inv2hz
        invhx, invhy, invhz = self.invhx, self.invhy, self.invhz
        sx_, sy_, zx_, zy_ = self.sx_, self.sy_, self.zx_, self.zy_
        ddx, ddy, dxt, dyt = self.ddx, self.ddy, self.dxt, self.dyt
        xpos, ypos = self.xpos, self.ypos
        gs = g_md[0]
        gu = (g_md[1], g_md[2], g_md[3])
        sc = f_md[4]
        u = (f_md[5], f_md[6], f_md[7])

        def ddz(ch):
            return (f_hi[ch] - f_lo[ch]) * inv2hz

        div_u = ddx(u[0]) + ddy(u[1]) + ddz(7)

        def zleg(fch, gch):
            """z part of D^T for product V = F[fch] * G[gch]:
            inv2hz*(V[d-1] - V[d+1]) with clamp edge corrections."""
            v_lo = f_lo[fch] * g_lo[gch]
            v_hi = f_hi[fch] * g_hi[gch]
            out = (v_lo - v_hi) * inv2hz
            if not per:
                # Clamp: row 0's z-stencil is (f[1]-f[0])/2h, so its
                # adjoint scatters -V[0] to itself; the logical row -1
                # (a clipped fake whose products are NOT V[0]) must not
                # contribute. dF[0] = -(V[0] + V[1])/2h and
                # dF[nz-1] = +(V[nz-2] + V[nz-1])/2h, with V[d] taken
                # from the true row-d products.
                v_md = f_md[fch] * g_md[gch]
                out = jnp.where(d == 0, -(v_md + v_hi) * inv2hz, out)
                out = jnp.where(d == nz - 1, (v_lo + v_md) * inv2hz, out)
            return out

        if self.upwind:
            # Upwind adjoint. The advection is u_b * D_b^up(c) with
            # D^up(c)[x] = s[x]*(c[x]-c[x-1])/h + (1-s[x])*(c[x+1]-c[x])/h,
            # s = (u_b > 0) frozen at the primal (the a.e. derivative of
            # the where). Two leg kinds:
            #   velocity legs (elementwise): g * D_b^up(c);
            #   carried-field transpose with weights w = u_b * g:
            #     dc[x] = ( wb[x] - wf[x] - wb[x+1] + wf[x-1] ) / h,
            #     wb = s*w (backward branch), wf = (1-s)*w (forward),
            #   since row x's backward difference touches c[x] (+) and
            #   c[x-1] (-), the forward one c[x+1] (+) and c[x] (-).
            # Clamp: an edge row's outward branch degenerates to 0 in
            # the forward ((c-c)/h via the clipped halo), so its weight
            # is masked out; out-of-range neighbor terms are dropped.
            selx, sely, selz = u[0] > 0.0, u[1] > 0.0, u[2] > 0.0

            def upx(c):
                b = (c - sx_(c, -1)) * invhx
                f = (sx_(c, 1) - c) * invhx
                return jnp.where(selx, b, f)

            def upy(c):
                b = (c - sy_(c, -1)) * invhy
                f = (sy_(c, 1) - c) * invhy
                return jnp.where(sely, b, f)

            def upz(ch):
                b = (f_md[ch] - f_lo[ch]) * invhz
                f = (f_hi[ch] - f_md[ch]) * invhz
                return jnp.where(selz, b, f)

            def uwt_x(wv):
                wb = jnp.where(selx, wv, 0.0)
                wf = wv - wb
                if not per:
                    x = xpos(wv)
                    wb = jnp.where(x == 0, 0.0, wb)
                    wf = jnp.where(x == nx - 1, 0.0, wf)
                return (wb - wf - zx_(wb, 1) + zx_(wf, -1)) * invhx

            def uwt_y(wv):
                wb = jnp.where(sely, wv, 0.0)
                wf = wv - wb
                if not per:
                    y = ypos(wv)
                    wb = jnp.where(y == 0, 0.0, wb)
                    wf = jnp.where(y == ny - 1, 0.0, wf)
                return (wb - wf - zy_(wb, 1) + zy_(wf, -1)) * invhy

            def uwt_z(gch):
                w_md_ = u[2] * g_md[gch]
                wb_md = jnp.where(selz, w_md_, 0.0)
                wf_md = w_md_ - wb_md
                w_hi_ = f_hi[7] * g_hi[gch]
                wb_hi = jnp.where(f_hi[7] > 0.0, w_hi_, 0.0)
                w_lo_ = f_lo[7] * g_lo[gch]
                wf_lo = jnp.where(f_lo[7] > 0.0, 0.0, w_lo_)
                if not per:
                    # row 0 has no backward branch, row nz-1 no forward;
                    # neighbor terms from nonexistent rows are dropped
                    # (g_lo at d=0 / g_hi at d=nz-1 are clipped fakes)
                    wb_md = jnp.where(d == 0, 0.0, wb_md)
                    wf_md = jnp.where(d == nz - 1, 0.0, wf_md)
                    wb_hi = jnp.where(d == nz - 1, 0.0, wb_hi)
                    wf_lo = jnp.where(d == 0, 0.0, wf_lo)
                return (wb_md - wf_md - wb_hi + wf_lo) * invhz

            dsig = (
                uwt_x(u[0] * gs) + uwt_y(u[1] * gs) + uwt_z(0)
                + gs * div_u
            )
            dux_t = (
                gs * upx(sc)
                + gu[0] * upx(u[0]) + gu[1] * upx(u[1]) + gu[2] * upx(u[2])
                + dxt(sc * gs)      # sigma*div_u leg stays central
                + uwt_x(u[0] * gu[0]) + uwt_y(u[1] * gu[0]) + uwt_z(1)
            )
            duy_t = (
                gs * upy(sc)
                + gu[0] * upy(u[0]) + gu[1] * upy(u[1]) + gu[2] * upy(u[2])
                + dyt(sc * gs)
                + uwt_x(u[0] * gu[1]) + uwt_y(u[1] * gu[1]) + uwt_z(2)
            )
            duz_t = (
                gs * upz(4)
                + gu[0] * upz(5) + gu[1] * upz(6) + gu[2] * upz(7)
                + zleg(4, 0)        # D_z^T(sigma*gs), central
                + uwt_x(u[0] * gu[2]) + uwt_y(u[1] * gu[2]) + uwt_z(3)
            )
        else:
            dsig = (
                dxt(u[0] * gs)
                + dyt(u[1] * gs)
                + zleg(7, 0)          # P_z = u_z * gs
                + gs * div_u
            )
            dux_t = (
                gs * ddx(sc)
                + gu[0] * ddx(u[0]) + gu[1] * ddx(u[1]) + gu[2] * ddx(u[2])
                + dxt(sc * gs)          # D_x^T(Q)
                + dxt(u[0] * gu[0])     # D_x^T(T_xx)
                + dyt(u[1] * gu[0])     # D_y^T(T_yx)
                + zleg(7, 1)                          # D_z^T(T_zx)
            )
            duy_t = (
                gs * ddy(sc)
                + gu[0] * ddy(u[0]) + gu[1] * ddy(u[1]) + gu[2] * ddy(u[2])
                + dyt(sc * gs)
                + dxt(u[0] * gu[1])
                + dyt(u[1] * gu[1])
                + zleg(7, 2)
            )
            duz_t = (
                gs * ddz(4)
                + gu[0] * ddz(5) + gu[1] * ddz(6) + gu[2] * ddz(7)
                + zleg(4, 0)                          # D_z^T(Q)
                + dxt(u[0] * gu[2])
                + dyt(u[1] * gu[2])
                + zleg(7, 3)
            )

        return (
            (-gs * inv2dt, -gu[0] * inv2dt, -gu[1] * inv2dt, -gu[2] * inv2dt),
            (dsig, dux_t, duy_t, duz_t),
            (gs * inv2dt, gu[0] * inv2dt, gu[1] * inv2dt, gu[2] * inv2dt),
        )


def _build_bwd_call(
    g: GridSpec, h: int, w: PhysWeights, precision, interpret,
    nz_local: int | None = None, hk: int | None = None,
):
    """nz_local < nz builds the SHARD-LOCAL kernel: it processes rows
    [z0, z0 + nz_local) of the global grid, z0 arriving as a runtime scalar
    (SMEM input) so one program serves every shard under shard_map. Halo
    rows are recomputed from the (replicated) MLP tables instead of
    communicated; clamp edge corrections key on GLOBAL row indices.
    hk: H-chunk size for the per-chunk MLP loops (default: pick_hk(h),
    the largest divisor of H <= 64; must divide H).

    Unaligned nx (mega_flat(g)) runs every plane in the FLAT [R, 128]
    layout: the caller passes AB reshaped to [H, R, 128], the in-plane
    difference/transpose closures swap to the flat cyclic-shift forms, and
    everything else (MLP stages, z legs, reductions) is layout-oblivious —
    a plane is just ny*nx contiguous cells either way."""
    ops = _PlaneOps(g, w)
    nz, ny, nx = g.shape
    flat, pny, pnx = ops.flat, ops.pny, ops.pnx
    if nz_local is None:
        nz_local = nz
    n_prog = nz_local + 4
    if hk is None:
        hk = pick_hk(h)
    assert h % hk == 0, f"H-chunk {hk} must divide H={h}"
    n_chunks = h // hk
    dw2_mode = _resolve_mode("dw2", precision)
    da1_mode = _resolve_mode("da1", precision)
    fwd_mode = _resolve_mode("fwd", precision)
    dot_prec = (
        jax.lax.Precision.DEFAULT if precision == "bf16"
        else jax.lax.Precision.HIGHEST
    )
    # dW2T: Mosaic's tpu.matmul needs a single contracting dim, so the
    # [*, ny, nx] operands are collapsed to [*, ny*nx] first.
    dims_dw2 = (((1,), (1,)), ((), ()))         # [4,M] x [hk,M] -> [4,hk]
    phys_row = ops.phys_row

    def fslot_i(j):  # field row written at program j lives in slot j % 5
        return jax.lax.rem(j + 20, 5)

    def gslot_i(j):  # cotangent row written at program j -> slot j % 3
        return jax.lax.rem(j + 9, 3)

    def kernel(z0_ref, ab_ref, abf_ref, cd_ref, w2_ref, w2hk_ref, b2_ref,
               part_ref, dab_ref, dcdx_ref, dw2_ref, db2x_ref,
               fwin, gwin):
        i = pl.program_id(0)
        z0 = z0_ref[0, 0]  # first global row of this shard's range

        @pl.when(i == 0)
        def _():
            dab_ref[...] = jnp.zeros_like(dab_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2x_ref[...] = jnp.zeros_like(db2x_ref)

        b2 = b2_ref[...]

        # ---- stage 1: MLP forward for logical field row L = z0 + i-2 -----
        L = z0 + i - 2
        cdv = cd_ref[phys_row(L)]  # [H, 3]
        slot_f = fslot_i(i)
        mlp_rows_into_window(
            fwin, slot_f, ab_ref, cdv, w2_ref, w2hk_ref, b2,
            n_chunks=n_chunks, hk=hk, precision=precision,
            fwd_mode=fwd_mode, dot_prec=dot_prec,
        )

        # ---- stage 2: residual + cotangents, global row r = z0 + i-3 -----
        @pl.when(i >= 2)
        def _():
            r = z0 + i - 3
            r_sigma, r_ux, r_uy, r_uz = ops.stage2_residuals(
                fwin[fslot_i(i - 2)], fwin[fslot_i(i - 1)], fwin[fslot_i(i)]
            )

            # raw per-plane partials (weights applied by sum_partials)
            r_loc = r - z0
            @pl.when(jnp.logical_and(r_loc >= 0, r_loc < nz_local))
            def _():
                rr = jnp.clip(r_loc, 0, nz_local - 1)
                part_ref[0, rr] = jnp.sum(r_sigma * r_sigma)
                part_ref[1, rr] = (
                    jnp.sum(r_ux * r_ux) + jnp.sum(r_uy * r_uy)
                    + jnp.sum(r_uz * r_uz)
                )

            sg = gslot_i(i)
            gwin[sg, 0] = r_sigma * ops.ss
            gwin[sg, 1] = r_ux * ops.su
            gwin[sg, 2] = r_uy * ops.su
            gwin[sg, 3] = r_uz * ops.su

        # ---- stage 3: adjoint + MLP backward, global row d = z0 + i-4 ----
        # (n_prog = nz_local + 4, so i-4 < nz_local holds for every program)
        @pl.when(i >= 4)
        def _():
            d = z0 + i - 4
            gy_rows = ops.stage3_adjoint(
                fwin[fslot_i(i - 3)],  # f_lo
                fwin[fslot_i(i - 2)],  # f_md
                fwin[fslot_i(i - 1)],  # f_hi
                gwin[gslot_i(i - 2)],  # g_lo
                gwin[gslot_i(i - 1)],  # g_md
                gwin[gslot_i(i)],      # g_hi
                d,
            )

            # ---- MLP backward in the FLAT [*, ny*nx] layout ---------------
            # The shaped layout forced a [*, ny, nx] -> [*, ny*nx] relayout
            # per chunk for the dW2 dot (measured ~2 ms/step); operating on
            # the pre-flattened AB copy needs only one small gy reshape per
            # slice, and dAB is accumulated once per chunk from the
            # slice-summed dz1 (3x less accumulator traffic).
            zd = phys_row(d)
            d_loc = d - z0
            cdv_d = cd_ref[zd]
            gy_f = []
            for s in range(3):
                gy = jnp.stack(gy_rows[s]).reshape(4, ny * nx)
                gy_f.append(gy)
                # db2: full reduce, broadcast-written (column 0 read outside)
                db2x_ref[...] = db2x_ref[...] + jnp.broadcast_to(
                    jnp.sum(gy, axis=1, keepdims=True), (4, pnx)
                )
            for c in range(n_chunks):
                abf = abf_ref[pl.ds(c * hk, hk)]  # [hk, ny*nx]
                w2c = w2_ref[:, pl.ds(c * hk, hk)]  # [4, hk]
                dz1_sum = jnp.zeros((hk, ny * nx), jnp.float32)
                for s in range(3):
                    gy = gy_f[s]
                    # one-expression ReLU: a1f doubles as the dW2 operand
                    # and the mask source (a1f > 0 iff z1 > 0; ties give
                    # dz1 = 0 either way) — no z1f materialization
                    a1f = jnp.maximum(
                        abf + cdv_d[c * hk : (c + 1) * hk, s][:, None], 0.0
                    )
                    gy_in = (
                        gy.astype(jnp.bfloat16) if precision == "bf16" else gy
                    )
                    a1_in = (
                        a1f.astype(jnp.bfloat16) if precision == "bf16" else a1f
                    )
                    # NOTE: HIGHEST here is measured as fast as bf16x3 split
                    # passes on this chip (native-rate f32 MXU); bf16x3 only
                    # added split overhead, so f32_high shares this path.
                    if dw2_mode == "dot":
                        dw2_ref[:, pl.ds(c * hk, hk)] = (
                            dw2_ref[:, pl.ds(c * hk, hk)]
                            + jax.lax.dot_general(
                                gy_in, a1_in, dimension_numbers=dims_dw2,
                                preferred_element_type=jnp.float32,
                                precision=dot_prec,
                            )
                        )
                    else:  # "vpu": per-channel multiply + lane reduction
                        for o in range(4):
                            contrib = jnp.sum(
                                a1f * gy[o : o + 1], axis=1, keepdims=True
                            )
                            dw2_ref[pl.ds(c * hk, hk), o : o + 1] = (
                                dw2_ref[pl.ds(c * hk, hk), o : o + 1] + contrib
                            )
                    # da1[h, m] = sum_o W2[h, o] * gy[o, m]. As a matmul the
                    # K=4 contraction leaves the MXU ~3% utilized (ablation:
                    # ~3.4 ms/step f32); the vpu arm instead runs 4
                    # broadcast-FMAs over [hk, M] ([hk,1] sublane-sourced x
                    # [1,M] lane-sourced — lane-sourced 1-D broadcasts are
                    # what Mosaic rejects, hence the [h,4] W2 copy).
                    if da1_mode == "vpu":
                        w2k = w2hk_ref[pl.ds(c * hk, hk), :]  # [hk, 4]
                        da1 = w2k[:, 0:1] * gy[0:1]
                        for o in range(1, 4):
                            da1 = da1 + w2k[:, o : o + 1] * gy[o : o + 1]
                    else:
                        da1 = jax.lax.dot_general(
                            w2c, gy,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dot_prec,
                        )  # [hk, ny*nx]
                    dz1 = jnp.where(a1f > 0.0, da1, 0.0)
                    dz1_sum = dz1_sum + dz1
                    # dCD[zd, s]: full reduce, broadcast-written
                    dcdx_ref[d_loc, s, pl.ds(c * hk, hk)] = jnp.broadcast_to(
                        jnp.sum(dz1, axis=1, keepdims=True), (hk, pnx)
                    )
                dab_ref[pl.ds(c * hk, hk)] = (
                    dab_ref[pl.ds(c * hk, hk)] + dz1_sum
                )

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((h, pny, pnx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, ny * nx), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nz, h, 3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((2, nz_local), lambda i: (0, 0), memory_space=pltpu.SMEM),
        # dAB in the flat layout (reshaped back outside)
        pl.BlockSpec((h, ny * nx), lambda i: (0, 0), memory_space=pltpu.VMEM),
        # dCD reductions, broadcast along the lane dim (column 0 read
        # outside); VMEM-resident across the sweep, written once per row
        pl.BlockSpec((nz_local, 3, h, pnx), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (4, h) if dw2_mode == "dot" else (h, 4),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((4, pnx), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((2, nz_local), jnp.float32),
        jax.ShapeDtypeStruct((h, ny * nx), jnp.float32),
        jax.ShapeDtypeStruct((nz_local, 3, h, pnx), jnp.float32),
        jax.ShapeDtypeStruct(
            (4, h) if dw2_mode == "dot" else (h, 4), jnp.float32
        ),
        jax.ShapeDtypeStruct((4, pnx), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((5, 12, pny, pnx), jnp.float32),  # field window
            pltpu.VMEM((3, 4, pny, pnx), jnp.float32),   # cotangent window
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * h * 4 + h) * g.num_cells * 3 + 300 * g.num_cells,
            bytes_accessed=2 * (h * ny * nx + nz * h * 3) * 4,
            transcendentals=0,
        ),
    )


def _ab_operands(g: GridSpec, h: int, ab):
    """(shaped-or-flat AB, flat AB) kernel operands from the [H, ny, nx]
    table — flat mode reinterprets each plane as [R, 128] lane rows (a pure
    C-order reshape, so both views alias the same cells)."""
    abf = ab.reshape(h, g.ny * g.nx)
    if mega_flat(g):
        return abf.reshape(h, flat_rows(g), 128), abf
    return ab, abf


def mega_loss_and_grad(
    g: GridSpec,
    w: PhysWeights,
    cfg: MLPGridConfig,
    params: mlp.Params,
    t,
    precision: str = "f32",
    interpret=None,
):
    """(loss, (grad_params, grad_t)) from ONE kernel pass.

    Falls back to the slab-scan gradient for unsupported configurations
    (planes that cannot be 128-aligned — see mega_supported)."""
    if interpret is None:
        interpret = _default_interpret()
    if not mega_supported(g):
        from phys_autodiff_tpu.train.slab_grad import make_slab_loss_and_grad

        return make_slab_loss_and_grad(g, w, cfg, precision=precision)(params, t)

    t = jnp.float32(t)
    dt = jnp.float32(g.dt)
    h = cfg.dims.H

    def tables(p, tt):
        ts = jnp.stack([tt - dt, tt, tt + dt])
        return fold_tables_mega(g, cfg, p, ts)

    (ab, cd, w2t, b2), vjp = jax.vjp(tables, params, t)
    nz, ny, nx = g.shape
    z0 = jnp.zeros((1, 1), jnp.int32)
    ab_k, abf = _ab_operands(g, h, ab)
    parts, dabf, dcdx, dw2g, db2x = _build_bwd_call(g, h, w, precision, interpret)(
        z0, ab_k, abf, cd, w2t, w2t.T, b2
    )
    if _resolve_dw2_mode(precision) != "dot":
        dw2g = dw2g.T  # the vpu arm accumulates [h, 4]
    ls, lu = ops_loss.sum_partials(g, w, parts)
    dab = dabf.reshape(h, ny, nx)
    # dcdx/db2x carry the reduced value broadcast along lanes: column 0
    dcd = jnp.moveaxis(dcdx[..., 0], 1, 2)  # [nz, 3, H] -> [nz, H, 3]
    db2 = db2x[:, 0].reshape(1, 4)
    d_params, d_t = vjp((dab, dcd, dw2g, db2))
    return ls + lu, (d_params, d_t)


def mega_loss_and_grad_sharded(
    g: GridSpec,
    w: PhysWeights,
    cfg: MLPGridConfig,
    mesh,
    precision: str = "f32",
    interpret=None,
):
    """Returns fn(params, t) -> (loss, (grad_params, grad_t)) running the
    fused backward mega-kernel PER SHARD under shard_map: each device's
    kernel instance covers its contiguous z range (z0 arrives as a runtime
    scalar), halo rows are recomputed from the replicated tables instead of
    communicated, parameter-gradient partials are psum'd, per-row dCD
    gradients all-gathered, and the loss combined from gathered per-plane
    partials in the fixed global order (sum_partials) — so the sharded loss
    matches the single-chip kernel at the 1e-7 doctrine and no device ever
    materializes anything grid-sized."""
    from jax.sharding import PartitionSpec as P

    from phys_autodiff_tpu.parallel.mesh import Z_AXIS

    if interpret is None:
        interpret = _default_interpret()
    assert mega_supported(g), (
        "backward mega-kernel needs a central/upwind scheme and a "
        "128-alignable plane (nx % 128 == 0 with ny % 8 == 0, or "
        "ny*nx % 128 == 0 for flat)"
    )
    n_shards = mesh.shape[Z_AXIS]
    assert g.nz % n_shards == 0
    nz_local = g.nz // n_shards
    h = cfg.dims.H
    nz, ny, nx = g.shape
    dt = jnp.float32(g.dt)
    call = _build_bwd_call(g, h, w, precision, interpret, nz_local=nz_local)

    def tables(p, tt):
        ts = jnp.stack([tt - dt, tt, tt + dt])
        return fold_tables_mega(g, cfg, p, ts)

    def local(params, t):
        t = jnp.float32(t)
        me = jax.lax.axis_index(Z_AXIS)
        z0 = (me * nz_local).astype(jnp.int32).reshape(1, 1)
        (ab, cd, w2t, b2), vjp = jax.vjp(tables, params, t)
        ab_k, abf = _ab_operands(g, h, ab)
        parts, dabf, dcdx, dw2g, db2x = call(
            z0, ab_k, abf, cd, w2t, w2t.T, b2
        )
        if _resolve_dw2_mode(precision) != "dot":
            dw2g = dw2g.T  # the vpu arm accumulates [h, 4]
        parts_all = jax.lax.all_gather(parts, Z_AXIS, axis=1, tiled=True)
        ls, lu = ops_loss.sum_partials(g, w, parts_all)
        dab = jax.lax.psum(dabf, Z_AXIS).reshape(h, ny, nx)
        dcd_local = jnp.moveaxis(dcdx[..., 0], 1, 2)  # [nz_local, H, 3]
        dcd = jax.lax.all_gather(dcd_local, Z_AXIS, axis=0, tiled=True)
        dw2t_g = jax.lax.psum(dw2g, Z_AXIS)
        db2 = jax.lax.psum(db2x, Z_AXIS)[:, 0].reshape(1, 4)
        d_params, d_t = vjp((dab, dcd, dw2t_g, db2))
        return ls + lu, d_params, d_t

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def loss_and_grad(params, t):
        loss, d_params, d_t = sharded(params, t)
        return loss, (d_params, d_t)

    return loss_and_grad
