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
            acc = jnp.zeros((4, ny, nx), jnp.float32)
            for c in range(n_chunks):
                ab = ab_ref[pl.ds(c * hk, hk)]  # [hk, ny, nx]
                z1 = ab + cdv[c * hk : (c + 1) * hk, s][:, None, None]
                a1 = jnp.maximum(z1, 0.0)
                w2c = w2_ref[:, pl.ds(c * hk, hk)]  # [4, hk]
                if precision == "bf16":
                    a1 = a1.astype(jnp.bfloat16)
                    w2c = w2c.astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    w2c,
                    a1,
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                    precision=dot_prec,
                )
            for o in range(4):
                window[slot, s * 4 + o] = acc[o] + b2[0, o]


def pick_mega_sz(nz: int, max_sz: int = 8) -> int:
    """z rows per program for the slab-batched mega kernel. The one-row
    rolling kernel's cost was dominated by per-program overhead (~7 us x
    (nz+2) programs — measured r03: 64^3 mega 0.43 ms vs 0.32 ms two-kernel,
    unchanged by the flat layout, i.e. NOT lane-bound); batching SZ rows per
    program amortizes it SZ-fold with zero recompute (a 2-row VMEM window
    carry-over between programs)."""
    return max(d for d in range(1, max_sz + 1) if nz % d == 0)


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
    hk = pick_hk(h)
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

        # fori_loop (not a python unroll): at sz=8 the unrolled body's live
        # values made Mosaic's register allocator spill ~215 MB of scoped
        # VMEM and refuse to compile; the loop keeps one row's working set
        # live at a time.
        def mlp_body(r, carry):
            mlp_row(r)
            return carry

        jax.lax.fori_loop(2, sz + 2, mlp_body, 0, unroll=False)

        # ---- residuals + loss partials, one row at a time ----------------
        # window channel layout: s*4 + o, slices (tm1, t, tp1),
        # channels (sigma, ux, uy, uz).
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
