"""The MLP -> residual -> loss mega-kernel.

The reference names this as its own next step (docs/BENCHMARK_REPORT.md:61-62,
docs/PLAN_MLP_SMOKE_INTEGRATION.md:51): fuse field generation into the
physics kernel so the 12-plane field block never exists in memory. Here it
never exists in HBM at all:

  * grid = (nz + 2,) programs. Program i evaluates the MLP for the single
    logical z row i-1 (physical row = wrap/clamp), all three time slices,
    into a 3-row rolling window in VMEM scratch (scratch persists across the
    sequential TPU grid).
  * Layer 1 is the rank-1 table factorization shared with pallas/mlp.py:
    z1[h,y,x] = AB[h,y,x] + CD[z,h,s]. AB (6.3 MB at H=128) is fetched once
    (constant index map) and stays VMEM-resident for the whole sweep; the
    hidden activation exists only as an H-chunked transient.
  * Once the window holds rows r-1, r, r+1, the program computes row r's
    transport residual (reusing the slab kernel's math, including the
    scheme/upwind switch) and reduces it to the per-plane loss partials
    [2, nz] — the deterministic-reduction contract of ops.loss.sum_partials.

Traffic: reads AB + CD + W2 (~6.5 MB) and writes 8*nz bytes. Everything else
lives and dies in VMEM. Compare the two-kernel packed pipeline: 56 MB of
field writes + 56 MB of reads.

Differentiable via custom_vjp through the staged path; the training step
pairs it with the slab-recompute backward (train/slab_grad.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.ops import loss as ops_loss
from phys_autodiff_tpu.pallas.residuals import _slab_residuals
from phys_autodiff_tpu.utils.config import GridSpec, MLPGridConfig, PhysWeights


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


# Layer-2 contraction strategy: the [4,hk] x [hk,M] dot has 4 output rows
# (>96% of the MXU idle), so for f32 a per-channel VPU weighted reduction
# wins; bf16 keeps the native-rate MXU dot. Same measured trade as the
# backward mega-kernel's fwd stage (pallas/mega_bwd.py mode table).
_FWD_MODE = "auto"
# Stage-granularity knobs (hardware-measured r03 ablation; DESIGN.md
# "Mega forward granularity"):
# _SLAB_EVAL: "auto" = batch ONLY for flat-bf16 planes without a 16-multiple
#   sublane count (the one measured win: the merged-rows cast dodges the
#   bf16 (16,128)-tile relayout, 96x96x64 bf16 1.32 -> 0.93 ms); "row"/
#   "batch" force per-row fori / wide multi-row passes. Everywhere else
#   batching measured neutral (bf16) or VMEM-OOMed (f32 VPU transients).
# _MEGA_HK: "auto" = pick_hk (<=64 chunks); "full" = whole-H single pass
#   (measured neutral).
# _RES_EVAL: "slab" = one whole-window _slab_residuals pass (measured 2-5%
#   faster at every grid/precision), "row" = per-row fori.
_SLAB_EVAL = "auto"
_MEGA_HK = "auto"
_RES_EVAL = "slab"


def _resolve_slab_eval(precision: str, flat: bool, py: int) -> str:
    if _SLAB_EVAL != "auto":
        return _SLAB_EVAL
    return "batch" if (precision == "bf16" and flat and py % 16 != 0) else "row"


def pick_hk(h: int) -> int:
    """Largest divisor of H that is <= 64 — the H-chunk for the per-chunk
    MLP loops (a pure scheduling knob; measured flat within ~3%)."""
    return max(d for d in range(1, min(h, 64) + 1) if h % d == 0)


def _resolve_fwd_mode(precision) -> str:
    if _FWD_MODE != "auto":
        return _FWD_MODE
    # Whitelist the exact-f32 tiers (matches pallas/mlp.py): the VPU arm is
    # plain f32 arithmetic, so routing a mixed-precision tier through it
    # would silently change the program being measured.
    return "vpu" if precision in ("f32", "f32_high") else "dot"


def fold_tables_mega(g: GridSpec, cfg: MLPGridConfig, params: mlp.Params, ts):
    """Rank-1 layer-1 tables in the mega-kernel layout (the shared folds
    from pallas/mlp.py, with AB kept as one unblocked [H, ny, nx] plane).

    Returns (AB [H, ny, nx], CD [nz, H, S], W2T [4, H], b2 [1, 4])."""
    from phys_autodiff_tpu.pallas.mlp import fold_ab_plane, fold_cd

    ab = fold_ab_plane(g, cfg, params)
    cd = fold_cd(g, cfg, params, ts)
    return ab, cd, params["W2"].T, params["b2"].reshape(1, -1)


def mlp_rows_into_window(
    window,
    slot,
    ab_ref,
    cdv,
    w2_ref,
    w2hk_ref,
    b2,
    *,
    n_chunks: int,
    hk: int,
    precision: str,
    fwd_mode: str,
    dot_prec,
):
    """Evaluate the 2-layer MLP for ONE z row (all 3 time slices) into a
    rolling field window: window[slot, s*4 + o] = layer2(relu(AB + CD)).

    Shared by the forward mega-kernel and the backward mega-kernel's
    stage 1, so the contraction-strategy tuning ("vpu" per-channel
    leading-dim weighted reduction for the f32 tiers vs the MXU dot for
    bf16 — see the mode table in pallas/mega_bwd.py) and the H-chunk
    contract live in one place. cdv: [H, 3]; ab_ref: [H, ny, nx]."""
    ny, nx = ab_ref.shape[-2:]
    dims = (((1,), (0,)), ((), ()))
    for s in range(3):
        if fwd_mode == "vpu":
            accs = [jnp.zeros((ny, nx), jnp.float32) for _ in range(4)]
            for c in range(n_chunks):
                ab = ab_ref[pl.ds(c * hk, hk)]  # [hk, ny, nx]
                z1 = ab + cdv[c * hk : (c + 1) * hk, s][:, None, None]
                a1 = jnp.maximum(z1, 0.0)
                for o in range(4):
                    wcol = w2hk_ref[pl.ds(c * hk, hk), o : o + 1][..., None]
                    accs[o] = accs[o] + jnp.sum(a1 * wcol, axis=0)
            for o in range(4):
                window[slot, s * 4 + o] = accs[o] + b2[0, o]
        else:
            # bf16 sublane-tile alignment (round 4): on flat planes whose
            # row count misses the 16-row bf16 tile (96x96x64: R=72) the
            # rank-3 [hk, ny, nx] cast pays a relayout per chunk x slice x
            # row — measured as the backward mega-kernel's bf16 tier
            # collapsing to 1.12x f32 at that grid (vs 1.84x aligned).
            # Collapsing to rank-2 [hk, ny*nx] puts hk (a 16-multiple) on
            # the sublane axis; the dot contracts identically, so the
            # result is bit-equal mod reshape.
            merge = (
                precision == "bf16" and ny % 16 != 0 and (ny * nx) % 128 == 0
            )
            acc = jnp.zeros((4, ny, nx), jnp.float32)
            for c in range(n_chunks):
                ab = ab_ref[pl.ds(c * hk, hk)]  # [hk, ny, nx]
                z1 = ab + cdv[c * hk : (c + 1) * hk, s][:, None, None]
                a1 = jnp.maximum(z1, 0.0)
                w2c = w2_ref[:, pl.ds(c * hk, hk)]  # [4, hk]
                if merge:
                    a1 = a1.reshape(hk, ny * nx)
                if precision == "bf16":
                    a1 = a1.astype(jnp.bfloat16)
                    w2c = w2c.astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    w2c,
                    a1,
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                    precision=dot_prec,
                )
                acc = acc + (part.reshape(4, ny, nx) if merge else part)
            for o in range(4):
                window[slot, s * 4 + o] = acc[o] + b2[0, o]


def mega_forward_fits(g, h: int = 128) -> bool:
    """VMEM feasibility of the mega forward at (g, H): the CD table window
    [nz, H, 3] is VMEM-resident for the whole sweep and Mosaic lane-pads
    its last dim 3 -> 128, so the footprint is nz * H * 128 * 4 bytes —
    50 MB fits at nz=768 but 67 MB blows the 64 MB scoped limit at nz=1024
    (H=128; measured, big-grid campaign 2026-08-20). Deep-z forwards route
    to the packed fieldgen + loss-kernel pipeline, which blocks CD per z
    row and scales to any nz."""
    return g.nz * h * 128 * 4 <= 56 * 1024 * 1024


def pick_mega_sz(nz: int, max_sz: int = 8) -> int:
    """z rows per program for the slab-batched mega kernel. Batching SZ rows
    per program lets the MLP stage evaluate many rows in ONE wide VPU/MXU
    pass (mlp_slab_into_window) instead of nz narrow per-row passes — the
    r03 ablation pinned the mega-vs-two-kernel gap on per-row op granularity
    (program-count batching alone left 64^3 at 0.43 ms, identical to the
    one-row kernel)."""
    return max(d for d in range(1, max_sz + 1) if nz % d == 0)


def pick_rb(n_rows: int, hk: int, py: int, px: int,
            budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Rows per batched MLP evaluation: the z1/a1 transient is
    [hk, rb, py, px] f32, so rb is capped by a VMEM transient budget."""
    per_row = hk * py * px * 4
    return max(1, min(n_rows, budget_bytes // max(per_row, 1)))


def mlp_slab_into_window(
    window,
    first_slot: int,
    n_rows: int,
    ab_ref,
    cd_rows,
    w2_ref,
    w2hk_ref,
    b2,
    *,
    n_chunks: int,
    hk: int,
    precision: str,
    fwd_mode: str,
    dot_prec,
):
    """Evaluate the 2-layer MLP for N_ROWS consecutive z rows (3 time
    slices) into window slots [first_slot, first_slot + n_rows) in BATCHED
    passes: one [hk, rb, py, px] elementwise layer-1 + one wide layer-2
    contraction per H-chunk, instead of n_rows narrow per-row passes (the
    per-row granularity was the measured mega-vs-two-kernel gap, r03).

    cd_rows: [n_rows, H, 3] layer-1 row constants (already gathered).
    first_slot and the row split are STATIC: all window writes are
    static-index stores. For bf16 the activation is merged to
    [hk, rb*py, px] before the cast when rb*py is a 16-multiple — planes
    whose sublane count is not (the flat 96x96 layout's R=72) would
    otherwise pay a bf16 (16,128)-tile relayout on every chunk (the root
    cause of the r02 96x96x64 bf16 inversion)."""
    ny, nx = ab_ref.shape[-2:]
    rb = pick_rb(n_rows, hk, ny, nx)
    if precision == "bf16" and ny % 16 == 8 and rb > 1 and rb % 2 == 1:
        rb -= 1  # keep rb*ny a 16-multiple so the merged bf16 cast is clean
    dims = (((1,), (0,)), ((), ()))
    for r0 in range(0, n_rows, rb):
        m = min(rb, n_rows - r0)
        for s in range(3):
            if fwd_mode == "vpu":
                accs = [jnp.zeros((m, ny, nx), jnp.float32) for _ in range(4)]
                for c in range(n_chunks):
                    ab = ab_ref[pl.ds(c * hk, hk)]  # [hk, ny, nx]
                    # per-row z1 build (a [hk] -> [hk,1,1] broadcast, the
                    # lowering the per-row path already proves; a 2-D
                    # [hk, m] -> [hk, m, 1, 1] reshape is NOT supported by
                    # Mosaic's layout inference), stacked into one wide
                    # [hk, m, ny, nx] activation for the batched reduction.
                    a1 = jnp.stack(
                        [
                            jnp.maximum(
                                ab
                                + cd_rows[r0 + r, c * hk : (c + 1) * hk, s][
                                    :, None, None
                                ],
                                0.0,
                            )
                            for r in range(m)
                        ],
                        axis=1,
                    )  # [hk, m, ny, nx]
                    for o in range(4):
                        wcol = w2hk_ref[pl.ds(c * hk, hk), o : o + 1]
                        accs[o] = accs[o] + jnp.sum(
                            a1 * wcol[..., None, None], axis=0
                        )
                for o in range(4):
                    for r in range(m):
                        window[first_slot + r0 + r, s * 4 + o] = (
                            accs[o][r] + b2[0, o]
                        )
            else:
                merge = (m * ny) % 16 == 0 and ny % 8 == 0
                acc = jnp.zeros((4, m, ny, nx), jnp.float32)
                for c in range(n_chunks):
                    ab = ab_ref[pl.ds(c * hk, hk)]
                    a1 = jnp.stack(
                        [
                            jnp.maximum(
                                ab
                                + cd_rows[r0 + r, c * hk : (c + 1) * hk, s][
                                    :, None, None
                                ],
                                0.0,
                            )
                            for r in range(m)
                        ],
                        axis=1,
                    )  # [hk, m, ny, nx]
                    w2c = w2_ref[:, pl.ds(c * hk, hk)]  # [4, hk]
                    if precision == "bf16":
                        if merge:
                            a1 = a1.reshape(hk, m * ny, nx)
                        a1 = a1.astype(jnp.bfloat16)
                        w2c = w2c.astype(jnp.bfloat16)
                    elif merge:
                        a1 = a1.reshape(hk, m * ny, nx)
                    part = jax.lax.dot_general(
                        w2c,
                        a1,
                        dimension_numbers=dims,
                        preferred_element_type=jnp.float32,
                        precision=dot_prec,
                    )
                    acc = acc + (
                        part.reshape(4, m, ny, nx) if merge else part
                    )
                for o in range(4):
                    for r in range(m):
                        window[first_slot + r0 + r, s * 4 + o] = (
                            acc[o, r] + b2[0, o]
                        )


def _build_mega_call(
    g: GridSpec, h: int, precision: str, interpret: bool, flat: bool = False
):
    nz, ny, nx_true = g.shape
    if flat:
        # FLAT layout (round 3): planes as [ny*nx/128, 128] lane rows — no
        # padded junk lanes, no wasted MLP/stencil work (at 64^3 the padded
        # path doubled the lane work; that was most of the mega-vs-two-kernel
        # gap). Same reinterpretation as the flat residual kernels; stencil
        # shifts come from make_flat_shifters.
        from phys_autodiff_tpu.pallas.residuals import make_flat_shifters

        assert (ny * nx_true) % 128 == 0
        ny, nx = (ny * nx_true) // 128, 128
        nx_arg = None
        shifters = make_flat_shifters(g)
    else:
        # pad the lane dim to a 128 multiple; junk lanes are masked out of
        # the loss reduction and the boundary-corrected x-shifts never read
        # them into real lanes (residuals._shift_last with nx_true)
        nx = -(-nx_true // 128) * 128
        nx_arg = nx_true if nx != nx_true else None
        shifters = None
    sz = pick_mega_sz(nz)
    n_prog = nz // sz
    hk = h if _MEGA_HK == "full" else pick_hk(h)
    slab_eval = _resolve_slab_eval(precision, flat, ny)
    n_chunks = h // hk
    # Mosaic's in-kernel dot lowering supports DEFAULT and HIGHEST only
    # (no HIGH): clamp f32_high to HIGHEST inside the kernel; the f32_high
    # savings live in the XLA-level slab backward.
    dot_prec = (
        jax.lax.Precision.DEFAULT
        if precision == "bf16"
        else jax.lax.Precision.HIGHEST
    )
    fwd_mode = _resolve_fwd_mode(precision)

    def phys_row(lz):
        if g.periodic:
            return jax.lax.rem(lz + 2 * nz, nz)
        return jnp.clip(lz, 0, nz - 1)

    # Slab-batched pipeline (round 3): program j holds field rows for
    # logical z in [j*sz - 1, j*sz + sz] in a (sz+2)-row window. The first
    # two rows arrive by VMEM copy from the previous program's last two
    # (scratch persists across the sequential grid — zero recompute); the
    # remaining sz rows are MLP-evaluated fresh. Residuals for the slab's
    # sz rows then run in one _slab_residuals pass. The former one-row
    # rolling kernel spent ~7 us/program of fixed overhead over nz+2
    # programs (r03 measurement: 64^3 unchanged by the flat layout);
    # batching divides that by sz.
    def kernel(ab_ref, cd_ref, w2_ref, w2hk_ref, b2_ref, part_ref, window):
        j = pl.program_id(0)
        b2 = b2_ref[...]  # [1, 4]

        @pl.when(j > 0)
        def _():
            # logical rows j*sz-1, j*sz == previous program's last two rows
            window[0] = window[sz]
            window[1] = window[sz + 1]

        def mlp_row(r):
            # r may be traced: dynamic window-slot writes and cd row reads
            lz = j * sz + r - 1
            mlp_rows_into_window(
                window, r, ab_ref, cd_ref[phys_row(lz)],
                w2_ref, w2hk_ref, b2,
                n_chunks=n_chunks, hk=hk, precision=precision,
                fwd_mode=fwd_mode, dot_prec=dot_prec,
            )

        @pl.when(j == 0)
        def _():
            mlp_row(0)
            mlp_row(1)

        # Slots 2..sz hold logical rows j*sz+1 .. j*sz+sz-1 — always
        # in-range (no z wrap), so they batch into wide static-slot MLP
        # passes; only the top row (slot sz+1, logical (j+1)*sz, which
        # wraps/clamps at the last program) stays per-row.
        if sz > 1 and slab_eval == "batch":
            cd_rows = cd_ref[pl.ds(j * sz + 1, sz - 1)]  # [sz-1, H, 3]
            mlp_slab_into_window(
                window, 2, sz - 1, ab_ref, cd_rows, w2_ref, w2hk_ref, b2,
                n_chunks=n_chunks, hk=hk, precision=precision,
                fwd_mode=fwd_mode, dot_prec=dot_prec,
            )
            mlp_row(sz + 1)
        else:
            # per-row fori (ablation arm): one row's working set at a time
            jax.lax.fori_loop(
                2, sz + 2, lambda r, c: (mlp_row(r), c)[1], 0, unroll=False
            )

        # ---- residuals + loss partials -----------------------------------
        # window channel layout: s*4 + o, slices (tm1, t, tp1),
        # channels (sigma, ux, uy, uz).
        if _RES_EVAL == "slab":
            wv = window[...]  # [sz+2, 12, py, px]
            r_sigma, r_ux, r_uy, r_uz = _slab_residuals(
                g,
                wv[:, 4],
                (wv[:, 5], wv[:, 6], wv[:, 7]),
                wv[1:-1, 0],
                wv[1:-1, 8],
                (wv[1:-1, 1], wv[1:-1, 2], wv[1:-1, 3]),
                (wv[1:-1, 9], wv[1:-1, 10], wv[1:-1, 11]),
                nx_true=nx_arg,
                shifters=shifters,
            )
            if nx_arg is not None:
                # 2-D mask: sq() takes per-ROW [py, px] slices, so a 3-D
                # mask would broadcast each row back to [sz, py, px]
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, r_sigma.shape[1:], 1
                )
                msk = lane < nx_true

                def sq(r):
                    return jnp.sum(jnp.where(msk, r * r, 0.0))
            else:

                def sq(r):
                    return jnp.sum(r * r)

            for k in range(sz):
                part_ref[0, j * sz + k] = sq(r_sigma[k])
                part_ref[1, j * sz + k] = (
                    sq(r_ux[k]) + sq(r_uy[k]) + sq(r_uz[k])
                )
            return

        def res_body(k, carry):
            w_lo = window[k]
            w_mid = window[k + 1]
            w_hi = window[k + 2]

            def zstack(ch):  # [3(z), py, px] for channel ch at slice t
                return jnp.stack([w_lo[ch], w_mid[ch], w_hi[ch]])

            r_sigma, r_ux, r_uy, r_uz = _slab_residuals(
                g,
                zstack(4),
                (zstack(5), zstack(6), zstack(7)),
                w_mid[0][None],   # sigma_tm1, center row
                w_mid[8][None],   # sigma_tp1
                (w_mid[1][None], w_mid[2][None], w_mid[3][None]),    # u_tm1
                (w_mid[9][None], w_mid[10][None], w_mid[11][None]),  # u_tp1
                nx_true=nx_arg,
                shifters=shifters,
            )
            if nx_arg is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, r_sigma.shape, 2)
                msk = lane < nx_true

                def sq(r):
                    return jnp.sum(jnp.where(msk, r * r, 0.0))
            else:

                def sq(r):
                    return jnp.sum(r * r)

            part_ref[0, j * sz + k] = sq(r_sigma)
            part_ref[1, j * sz + k] = sq(r_ux) + sq(r_uy) + sq(r_uz)
            return carry

        jax.lax.fori_loop(0, sz, res_body, 0, unroll=False)

    in_specs = [
        pl.BlockSpec((h, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nz, h, 3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, nz), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2, nz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sz + 2, 12, ny, nx), jnp.float32),  # field window
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # window carry is in-order
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * h * 4 + h) * g.num_cells * 3 + 60 * g.num_cells,
            bytes_accessed=(h * ny * nx + nz * h * 3) * 4,
            transcendentals=0,
        ),
    )


def _mega_impl(g, w, cfg, params, t, precision, interpret):
    from phys_autodiff_tpu.pallas.residuals import flat_rows

    if interpret is None:
        interpret = _default_interpret()
    flat = g.nx % 128 != 0 and flat_rows(g) is not None and g.nx >= 3 and g.ny >= 3
    if flat and precision == "bf16":
        # Layout is precision-aware (hardware-measured, DESIGN.md "Mega
        # forward granularity"): a flat plane whose row count is not a
        # 16-multiple pays a bf16 (16,128)-tile relayout per H-chunk that
        # outweighs modest lane padding (96x96x64: flat 0.90 ms vs padded
        # 0.56). Route bf16 to the padded layout when the pad ratio is
        # small and the padded plane's sublane count is tile-clean; wide
        # pads (nx < ~85: >1.5x junk lanes, e.g. 64^3's 2x) stay flat.
        if flat_rows(g) % 16 != 0 and g.ny % 16 == 0:
            pad_ratio = (-(-g.nx // 128) * 128) / g.nx
            if pad_ratio <= 1.5:
                flat = False
    if not flat and (g.ny % 8 != 0 or g.nx < 3):
        # Mosaic sublane alignment fallback: staged pipeline.
        return _staged_loss(g, w, cfg, params, t)
    t = jnp.float32(t)
    dt = jnp.float32(g.dt)
    ts = jnp.stack([t - dt, t, t + dt])
    h = params["W1"].shape[1]
    ab, cd, w2t, b2 = fold_tables_mega(g, cfg, params, ts)
    if flat:
        # pure C-order reshape: the flat plane IS the shaped plane's cells
        ab = ab.reshape(h, (g.ny * g.nx) // 128, 128)
    else:
        nxp = -(-g.nx // 128) * 128
        if nxp != g.nx:
            ab = jnp.pad(ab, ((0, 0), (0, 0), (0, nxp - g.nx)))
    parts = _build_mega_call(g, h, precision, interpret, flat=flat)(
        ab, cd, w2t, w2t.T, b2
    )
    return ops_loss.sum_partials(g, w, parts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 5, 6))
def mega_loss_pipeline(
    g: GridSpec,
    w: PhysWeights,
    cfg: MLPGridConfig,
    params: mlp.Params,
    t,
    precision: str = "f32",
    interpret=None,
):
    """(L_sigma, L_u) from ONE kernel pass: MLP -> fields (VMEM-only) ->
    residuals -> per-plane partials -> fixed-order sum. Differentiable (the
    backward is the staged-path adjoint; the training step overrides it with
    the slab-recompute gradient via train.slab_grad.make_fused_loss)."""
    return _mega_impl(g, w, cfg, params, t, precision, interpret)


def _staged_loss(g, w, cfg, params, t):
    from phys_autodiff_tpu.models import fields as fields_mod

    fs = fields_mod.generate_fields(g, cfg, params, t, g.dt)
    return ops_loss.loss_forward(g, w, fs)


def _mega_fwd(g, w, cfg, params, t, precision, interpret):
    return _mega_impl(g, w, cfg, params, t, precision, interpret), (params, t)


def _mega_bwd(g, w, cfg, precision, interpret, res, cot):
    params, t = res
    _, vjp = jax.vjp(lambda p, tt: _staged_loss(g, w, cfg, p, tt), params, t)
    return vjp(cot)


mega_loss_pipeline.defvjp(_mega_fwd, _mega_bwd)
