"""One-kernel supervised-fit step: data-MSE loss AND parameter gradients.

TPU-native analogue of the reference's fused MLP backward
(`k_backward_fused_mlp`, src/mlp_cuda.cu:39-89, driven by
mlp_loss_grads_*, src/mlp_cuda.cu:123-184) — the ONE fused backward the
reference actually built, an MSE-vs-target head over the grid MLP. The
reference never connects it to real targets; here it drives
train/fit_field's supervised fitting (data assimilation / neural-field
compression) end to end.

Structure (cf. pallas/mega_bwd.py, which fuses the PHYSICS head): the data
loss has no stencil coupling, so no rolling window is needed — every z row
is independent and one program handles one row completely:

  forward   a1 = relu(AB + CD[z])  per H-chunk (rank-1 layer-1 tables,
            pallas/mlp.py folds), y = W2 . a1 + b2 accumulated over chunks;
  loss      e = y - target[z]; raw per-plane partials part[{sigma,u}, z]
            (combined outside by ops.loss.sum_partials — the deterministic
            fixed-order reduction every loss in the framework uses);
  backward  gy = (2 w / N) * e (the reference's residual-space VJP scale,
            src/phys_cpu.cpp:162-163, applied to the data error), then the
            standard MLP backward per H-chunk: dW2 += gy . a1^T,
            db2 += sum(gy), dz1 = [a1 > 0] * (W2^T gy), dAB += dz1,
            dCD[z] = sum_lanes(dz1).

Outside the kernel (same contract as mega_bwd), (dAB, dCD, dW2T, db2) pull
back to (W1, b1, W2, b2, t) through jax.vjp of the table fold — exact for
the kernel's own forward formulation. Nothing grid-sized beyond the target
itself exists in HBM in either direction: the [N, H] activation tensor the
XLA backward materializes (1.8 GB at the flagship grid for H=128) never
exists.

Plane layout: rows are processed FLAT ([ny*nx] cells per z row), so the
only alignment requirement is ny*nx % 128 == 0 — both the 128-aligned and
the reference's unaligned benchmark grids (64^3, 96x96x64) qualify.

Contraction strategy table is inherited from pallas/mega_bwd.py (measured
there on the identical shapes): f32 tiers run the VPU broadcast-FMA arms,
bf16 runs native-rate MXU dots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.ops import loss as ops_loss
from phys_autodiff_tpu.pallas.mega import pick_hk
from phys_autodiff_tpu.pallas.mega_bwd import _resolve_mode
from phys_autodiff_tpu.pallas.mlp import fold_ab_plane, fold_cd
from phys_autodiff_tpu.utils.config import GridSpec, MLPGridConfig, PhysWeights


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def fit_supported(g: GridSpec) -> bool:
    """Eligibility for the one-kernel fit step: rows are processed flat, so
    the only requirement is lane alignment of a whole plane. (No stencil ->
    no scheme/neighbor constraints, unlike mega_supported.)"""
    return (g.ny * g.nx) % 128 == 0


def _build_fit_call(
    g: GridSpec, h: int, w: PhysWeights, precision, interpret,
    nz_local: int | None = None,
):
    """nz_local < nz builds the SHARD-LOCAL kernel: it processes one
    contiguous block of nz_local rows whose CD columns and target rows the
    caller has already sliced — the data loss has no stencil coupling, so
    unlike mega_bwd's shard-local build there are no halos, no global row
    indices, and no runtime z0 scalar at all."""
    nz, ny, nx = g.shape
    if nz_local is not None:
        nz = nz_local
    m = ny * nx
    hk = pick_hk(h)
    n_chunks = h // hk
    fwd_mode = _resolve_mode("fwd", precision)
    dw2_mode = _resolve_mode("dw2", precision)
    da1_mode = _resolve_mode("da1", precision)
    dot_prec = (
        jax.lax.Precision.DEFAULT
        if precision == "bf16"
        else jax.lax.Precision.HIGHEST
    )
    # residual-space VJP scales (see module docstring)
    ss = 2.0 * float(w.w_sigma) / g.num_cells
    su = 2.0 * float(w.w_u) / g.num_cells
    dims_fwd = (((1,), (0,)), ((), ()))  # [4,hk] x [hk,M] -> [4,M]
    dims_dw2 = (((1,), (1,)), ((), ()))  # [4,M] x [hk,M] -> [4,hk]
    dims_da1 = (((0,), (0,)), ((), ()))  # [4,hk] x [4,M] -> [hk,M]

    def kernel(abf_ref, cd_ref, w2_ref, w2hk_ref, b2_ref, tgt_ref,
               part_ref, dabf_ref, dcdx_ref, dw2_ref, db2x_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dabf_ref[...] = jnp.zeros_like(dabf_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2x_ref[...] = jnp.zeros_like(db2x_ref)

        b2 = b2_ref[...]  # [1, 4]
        cdv = cd_ref[0]  # [H, 1]

        # ---- forward: y = W2 . relu(AB + CD[z]) + b2, chunked over H ----
        if fwd_mode == "vpu":
            ys = [jnp.zeros((1, m), jnp.float32) for _ in range(4)]
            for c in range(n_chunks):
                a1 = jnp.maximum(
                    abf_ref[pl.ds(c * hk, hk)] + cdv[c * hk : (c + 1) * hk], 0.0
                )  # [hk, M]
                w2k = w2hk_ref[pl.ds(c * hk, hk), :]  # [hk, 4]
                for o in range(4):
                    ys[o] = ys[o] + jnp.sum(
                        a1 * w2k[:, o : o + 1], axis=0, keepdims=True
                    )
            y = jnp.concatenate(ys, axis=0)  # [4, M]
        else:
            y = jnp.zeros((4, m), jnp.float32)
            for c in range(n_chunks):
                a1 = jnp.maximum(
                    abf_ref[pl.ds(c * hk, hk)] + cdv[c * hk : (c + 1) * hk], 0.0
                )
                w2c = w2_ref[:, pl.ds(c * hk, hk)]  # [4, hk]
                if precision == "bf16":
                    a1 = a1.astype(jnp.bfloat16)
                    w2c = w2c.astype(jnp.bfloat16)
                y = y + jax.lax.dot_general(
                    w2c, a1, dimension_numbers=dims_fwd,
                    preferred_element_type=jnp.float32, precision=dot_prec,
                )

        # ---- loss partials + scaled error cotangents ---------------------
        tgt = tgt_ref[0]  # [4, M]
        e_rows = [y[o : o + 1] + b2[0, o] - tgt[o : o + 1] for o in range(4)]
        part_ref[0, i] = jnp.sum(e_rows[0] * e_rows[0])
        part_ref[1, i] = (
            jnp.sum(e_rows[1] * e_rows[1])
            + jnp.sum(e_rows[2] * e_rows[2])
            + jnp.sum(e_rows[3] * e_rows[3])
        )
        gy = jnp.concatenate(
            [ss * e_rows[0], su * e_rows[1], su * e_rows[2], su * e_rows[3]],
            axis=0,
        )  # [4, M]
        db2x_ref[...] = db2x_ref[...] + jnp.broadcast_to(
            jnp.sum(gy, axis=1, keepdims=True), (4, 128)
        )

        # ---- MLP backward per H-chunk ------------------------------------
        gy_in = gy.astype(jnp.bfloat16) if precision == "bf16" else gy
        for c in range(n_chunks):
            a1 = jnp.maximum(
                abf_ref[pl.ds(c * hk, hk)] + cdv[c * hk : (c + 1) * hk], 0.0
            )  # [hk, M]
            if dw2_mode == "dot":
                a1_in = a1.astype(jnp.bfloat16) if precision == "bf16" else a1
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
                    dw2_ref[pl.ds(c * hk, hk), o : o + 1] = (
                        dw2_ref[pl.ds(c * hk, hk), o : o + 1]
                        + jnp.sum(a1 * gy[o : o + 1], axis=1, keepdims=True)
                    )
            if da1_mode == "vpu":
                w2k = w2hk_ref[pl.ds(c * hk, hk), :]  # [hk, 4]
                da1 = w2k[:, 0:1] * gy[0:1]
                for o in range(1, 4):
                    da1 = da1 + w2k[:, o : o + 1] * gy[o : o + 1]
            else:
                w2c = w2_ref[:, pl.ds(c * hk, hk)]
                if precision == "bf16":
                    w2c = w2c.astype(jnp.bfloat16)
                da1 = jax.lax.dot_general(
                    w2c, gy_in, dimension_numbers=dims_da1,
                    preferred_element_type=jnp.float32, precision=dot_prec,
                )  # [hk, M]
            dz1 = jnp.where(a1 > 0.0, da1, 0.0)
            dabf_ref[pl.ds(c * hk, hk)] = (
                dabf_ref[pl.ds(c * hk, hk)] + dz1
            )
            dcdx_ref[0, pl.ds(c * hk, hk)] = jnp.broadcast_to(
                jnp.sum(dz1, axis=1, keepdims=True), (hk, 128)
            )

    in_specs = [
        pl.BlockSpec((h, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((2, nz), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((h, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (4, h) if dw2_mode == "dot" else (h, 4),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((4, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((2, nz), jnp.float32),
        jax.ShapeDtypeStruct((h, m), jnp.float32),
        jax.ShapeDtypeStruct((nz, h, 128), jnp.float32),
        jax.ShapeDtypeStruct(
            (4, h) if dw2_mode == "dot" else (h, 4), jnp.float32
        ),
        jax.ShapeDtypeStruct((4, 128), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            # fwd + dW2 + da1 contractions (2*4*H each) + ~4 VPU sweeps
            flops=3 * (2 * h * 4) * g.num_cells + 8 * h * g.num_cells,
            bytes_accessed=(2 * h * m + 4 * g.num_cells + nz * h * 128) * 4,
            transcendentals=0,
        ),
    )


def pack_target(g: GridSpec, sigma, u) -> jnp.ndarray:
    """[nz, 4, ny*nx] kernel operand from the standard field layouts
    ([nz, ny, nx] sigma, [3, nz, ny, nx] u) — a pure reshape/transpose."""
    m = g.ny * g.nx
    s = jnp.asarray(sigma, jnp.float32).reshape(g.nz, 1, m)
    uu = jnp.moveaxis(jnp.asarray(u, jnp.float32).reshape(3, g.nz, m), 0, 1)
    return jnp.concatenate([s, uu], axis=1)


def fit_loss_and_grad(
    g: GridSpec,
    cfg: MLPGridConfig,
    params: mlp.Params,
    target_packed: jnp.ndarray,
    t,
    w: PhysWeights = PhysWeights(),
    precision: str = "f32",
    interpret=None,
):
    """(loss, (grad_params, grad_t)) of the weighted data MSE against one
    packed target ([nz, 4, ny*nx], see pack_target) from ONE kernel pass.

    Loss semantics match train.fit_field.data_loss (reference
    src/phys_cpu.cpp:140-148 weighting doctrine): L = w_sigma*mean(ds^2)
    + w_u*mean(sum_c du_c^2), combined by the deterministic fixed-order
    plane reduction (ops.loss.sum_partials)."""
    if interpret is None:
        interpret = _default_interpret()
    assert fit_supported(g), "one-kernel fit needs ny*nx % 128 == 0"
    h = cfg.dims.H
    m = g.ny * g.nx
    t = jnp.float32(t)

    def tables(p, tt):
        abf = fold_ab_plane(g, cfg, p).reshape(h, m)
        cd = fold_cd(g, cfg, p, jnp.stack([tt]))  # [nz, H, 1]
        return abf, cd, p["W2"].T, p["b2"].reshape(1, -1)

    (abf, cd, w2t, b2), vjp = jax.vjp(tables, params, t)
    call = _build_fit_call(g, h, w, precision, interpret)
    parts, dabf, dcdx, dw2g, db2x = call(abf, cd, w2t, w2t.T, b2, target_packed)
    if _resolve_mode("dw2", precision) != "dot":
        dw2g = dw2g.T  # the vpu arm accumulates [h, 4]
    ls, lu = ops_loss.sum_partials(g, w, parts)
    dcd = dcdx[..., :1]  # reduced value broadcast along lanes: column 0
    db2 = db2x[:, 0].reshape(1, 4)
    d_params, d_t = vjp((dabf, dcd, dw2g, db2))
    return ls + lu, (d_params, d_t)


def fit_loss_and_grad_sharded(
    g: GridSpec,
    cfg: MLPGridConfig,
    mesh,
    w: PhysWeights = PhysWeights(),
    precision: str = "f32",
    interpret=None,
):
    """Returns fn(params, target_packed, t) -> (loss, (grad_params,
    grad_t)) running the fit kernel PER SHARD under shard_map: the target
    arrives z-sharded (P(Z_AXIS) on its leading axis), each device's
    kernel instance covers its contiguous z rows (CD columns sliced
    locally — no halos, the data loss has no stencil), parameter-gradient
    partials are psum'd, per-row dCD gradients all-gathered, and the loss
    combined from gathered per-plane partials in the fixed global order —
    sharded == single-chip at the 1e-7 doctrine. The multi-chip analogue
    of mega_loss_and_grad_sharded for the SUPERVISED head."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from phys_autodiff_tpu.parallel.mesh import Z_AXIS

    if interpret is None:
        interpret = _default_interpret()
    assert fit_supported(g), "one-kernel fit needs ny*nx % 128 == 0"
    n_shards = mesh.shape[Z_AXIS]
    assert g.nz % n_shards == 0
    nz_local = g.nz // n_shards
    h = cfg.dims.H
    m = g.ny * g.nx
    call = _build_fit_call(g, h, w, precision, interpret, nz_local=nz_local)

    def tables(p, tt):
        abf = fold_ab_plane(g, cfg, p).reshape(h, m)
        cd = fold_cd(g, cfg, p, jnp.stack([tt]))  # [nz, H, 1]
        return abf, cd, p["W2"].T, p["b2"].reshape(1, -1)

    def local(params, tgt_local, t):
        t = jnp.float32(t)
        me = jax.lax.axis_index(Z_AXIS)
        (abf, cd, w2t, b2), vjp = jax.vjp(tables, params, t)
        cd_local = jax.lax.dynamic_slice_in_dim(
            cd, me * nz_local, nz_local, axis=0
        )
        parts, dabf, dcdx, dw2g, db2x = call(
            abf, cd_local, w2t, w2t.T, b2, tgt_local
        )
        if _resolve_mode("dw2", precision) != "dot":
            dw2g = dw2g.T
        parts_all = jax.lax.all_gather(parts, Z_AXIS, axis=1, tiled=True)
        ls, lu = ops_loss.sum_partials(g, w, parts_all)
        dabf = jax.lax.psum(dabf, Z_AXIS)
        dcd = jax.lax.all_gather(
            dcdx[..., :1], Z_AXIS, axis=0, tiled=True
        )  # [nz, H, 1]
        dw2g = jax.lax.psum(dw2g, Z_AXIS)
        db2 = jax.lax.psum(db2x, Z_AXIS)[:, 0].reshape(1, 4)
        d_params, d_t = vjp((dabf, dcd, dw2g, db2))
        return ls + lu, d_params, d_t

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(Z_AXIS, None, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    tgt_sharding = NamedSharding(mesh, P(Z_AXIS, None, None))

    def loss_and_grad(params, target_packed, t):
        loss, d_params, d_t = sharded(params, target_packed, t)
        return loss, (d_params, d_t)

    loss_and_grad.target_sharding = tgt_sharding
    return loss_and_grad


# ---------------------------------------------------------------------------
# The NGP (encoded-family) fused fit step — pallas/mega_ngp.py's head with
# the MSE-vs-target cotangent instead of the stencil adjoint. One program
# per z row: base = W1c^T enc (the time-independent layer-1 term,
# models/ngp.py _head_base), a1 = relu(base + tb1), y = W2 a1 + b2,
# e = y - target, then the head backward entirely in VMEM with dEnc as the
# kernel's one grid-sized output (pulled back through the scatter-free
# encoder VJP outside). The W1 time row's gradient is t * db1 (single
# slice), computed outside.
# ---------------------------------------------------------------------------


def _build_ngp_fit_call(
    g: GridSpec, lf: int, h: int, w: PhysWeights, precision, interpret,
    need_denc: bool = True, nz_local: int | None = None,
):
    """nz_local < nz builds the SHARD-LOCAL kernel: encoding, target, and
    dEnc blocks all cover one contiguous nz_local-row range the caller has
    already sliced (no halos, no global row indices — same simplification
    as the MLP fit kernel's shard-local build)."""
    nz = g.nz if nz_local is None else nz_local
    m = g.ny * g.nx
    r = m // 128
    # NGP-shaped kernel: use mega_ngp's mode table (round-4 hardware A/B:
    # h=64 / LF-base contractions favor MXU dots where the coordinate-MLP
    # kernel's all-VPU optimum does not transfer — see mega_ngp.py).
    from phys_autodiff_tpu.pallas.mega_ngp import _resolve_ngp_mode

    fwd_mode = _resolve_ngp_mode("fwd", precision)
    if fwd_mode == "vpu" and lf > 24:
        # per-channel FMA chains unroll LF plane-sized temporaries; Mosaic
        # spills them (measured in mega_ngp: LF=39 f32 -> 129 MB OOM)
        fwd_mode = "dot"
    dw2_mode = _resolve_ngp_mode("dw2", precision)
    da1_mode = _resolve_ngp_mode("da1", precision)
    dot_prec = (
        jax.lax.Precision.DEFAULT
        if precision == "bf16"
        else jax.lax.Precision.HIGHEST
    )
    ss = 2.0 * float(w.w_sigma) / g.num_cells
    su = 2.0 * float(w.w_u) / g.num_cells
    dims_base = (((1,), (0,)), ((), ()))  # [h,LF] x [LF,M] -> [h,M]
    dims_fwd = (((1,), (0,)), ((), ()))   # [4,h] x [h,M] -> [4,M]
    dims_da1 = (((0,), (0,)), ((), ()))   # [4,h] x [4,M] -> [h,M]
    dims_dw2 = (((1,), (1,)), ((), ()))   # [4,M] x [h,M] -> [4,h]
    dims_dw1 = (((1,), (1,)), ((), ()))   # [LF,M] x [h,M] -> [LF,h]
    dims_denc = (((1,), (0,)), ((), ()))  # [LF,h] x [h,M] -> [LF,M]

    def kernel(enc_ref, w1c_ref, w1hk_ref, tb1_ref, w2_ref, w2hk_ref,
               b2_ref, tgt_ref, *rest):
        if need_denc:
            part_ref, denc_ref, dw1_ref, db1x_ref, dw2_ref, db2x_ref = rest
        else:
            part_ref, dw1_ref, db1x_ref, dw2_ref, db2x_ref = rest
            denc_ref = None
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1x_ref[...] = jnp.zeros_like(db1x_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2x_ref[...] = jnp.zeros_like(db2x_ref)

        b2 = b2_ref[...]  # [1, 4]
        enc = enc_ref[0].reshape(lf, m)

        # ---- forward: base -> relu head -> y -----------------------------
        if fwd_mode == "vpu":
            base = w1hk_ref[:, 0:1] * enc[0:1]
            for c in range(1, lf):
                base = base + w1hk_ref[:, c : c + 1] * enc[c : c + 1]
        else:
            enc_in = enc.astype(jnp.bfloat16) if precision == "bf16" else enc
            w1k = w1hk_ref[...]
            if precision == "bf16":
                w1k = w1k.astype(jnp.bfloat16)
            base = jax.lax.dot_general(
                w1k, enc_in, dimension_numbers=dims_base,
                preferred_element_type=jnp.float32, precision=dot_prec,
            )  # [h, M]
        a1 = jnp.maximum(base + tb1_ref[...], 0.0)  # [h, M]
        if fwd_mode == "vpu":
            ys = [
                jnp.sum(a1 * w2hk_ref[:, o : o + 1], axis=0, keepdims=True)
                for o in range(4)
            ]
            y = jnp.concatenate(ys, axis=0)
        else:
            a1_in = a1.astype(jnp.bfloat16) if precision == "bf16" else a1
            w2c = w2_ref[...]
            if precision == "bf16":
                w2c = w2c.astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                w2c, a1_in, dimension_numbers=dims_fwd,
                preferred_element_type=jnp.float32, precision=dot_prec,
            )  # [4, M]

        # ---- loss partials + scaled error cotangents ---------------------
        tgt = tgt_ref[0]  # [4, M]
        e_rows = [y[o : o + 1] + b2[0, o] - tgt[o : o + 1] for o in range(4)]
        part_ref[0, i] = jnp.sum(e_rows[0] * e_rows[0])
        part_ref[1, i] = (
            jnp.sum(e_rows[1] * e_rows[1])
            + jnp.sum(e_rows[2] * e_rows[2])
            + jnp.sum(e_rows[3] * e_rows[3])
        )
        gy = jnp.concatenate(
            [ss * e_rows[0], su * e_rows[1], su * e_rows[2], su * e_rows[3]],
            axis=0,
        )  # [4, M]
        db2x_ref[...] = db2x_ref[...] + jnp.broadcast_to(
            jnp.sum(gy, axis=1, keepdims=True), (4, 128)
        )

        # ---- head backward ------------------------------------------------
        if da1_mode == "vpu":
            da1 = w2hk_ref[:, 0:1] * gy[0:1]
            for o in range(1, 4):
                da1 = da1 + w2hk_ref[:, o : o + 1] * gy[o : o + 1]
        else:
            gy_in = gy.astype(jnp.bfloat16) if precision == "bf16" else gy
            w2c = w2_ref[...]
            if precision == "bf16":
                w2c = w2c.astype(jnp.bfloat16)
            da1 = jax.lax.dot_general(
                w2c, gy_in, dimension_numbers=dims_da1,
                preferred_element_type=jnp.float32, precision=dot_prec,
            )  # [h, M]
        dz1 = jnp.where(a1 > 0.0, da1, 0.0)
        db1x_ref[...] = db1x_ref[...] + jnp.broadcast_to(
            jnp.sum(dz1, axis=1, keepdims=True), (h, 128)
        )
        if dw2_mode == "dot":
            gy_in = gy.astype(jnp.bfloat16) if precision == "bf16" else gy
            a1_in = a1.astype(jnp.bfloat16) if precision == "bf16" else a1
            dw2_ref[...] = dw2_ref[...] + jax.lax.dot_general(
                gy_in, a1_in, dimension_numbers=dims_dw2,
                preferred_element_type=jnp.float32, precision=dot_prec,
            )
        else:
            for o in range(4):
                dw2_ref[:, o : o + 1] = dw2_ref[:, o : o + 1] + jnp.sum(
                    a1 * gy[o : o + 1], axis=1, keepdims=True
                )
        enc_in = enc.astype(jnp.bfloat16) if precision == "bf16" else enc
        dz_in = dz1.astype(jnp.bfloat16) if precision == "bf16" else dz1
        dw1_ref[...] = dw1_ref[...] + jax.lax.dot_general(
            enc_in, dz_in, dimension_numbers=dims_dw1,
            preferred_element_type=jnp.float32, precision=dot_prec,
        )
        if denc_ref is not None:
            w1c = w1c_ref[...]
            if precision == "bf16":
                w1c = w1c.astype(jnp.bfloat16)
            denc = jax.lax.dot_general(
                w1c, dz_in, dimension_numbers=dims_denc,
                preferred_element_type=jnp.float32, precision=dot_prec,
            )  # [LF, M]
            denc_ref[0] = denc.reshape(lf, r, 128)

    in_specs = [
        pl.BlockSpec((1, lf, r, 128), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lf, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, lf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    denc_spec = (
        [
            pl.BlockSpec((1, lf, r, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
        if need_denc
        else []
    )
    denc_shape = (
        [jax.ShapeDtypeStruct((nz, lf, r, 128), jnp.float32)]
        if need_denc
        else []
    )
    out_specs = tuple(
        [pl.BlockSpec((2, nz), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + denc_spec
        + [
            pl.BlockSpec((lf, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, h) if dw2_mode == "dot" else (h, 4),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct((2, nz), jnp.float32)]
        + denc_shape
        + [
            jax.ShapeDtypeStruct((lf, h), jnp.float32),
            jax.ShapeDtypeStruct((h, 128), jnp.float32),
            jax.ShapeDtypeStruct(
                (4, h) if dw2_mode == "dot" else (h, 4), jnp.float32
            ),
            jax.ShapeDtypeStruct((4, 128), jnp.float32),
        ]
    )
    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * lf * h + 6 * h * 4 + 2 * lf * h) * g.num_cells,
            bytes_accessed=2 * lf * g.num_cells * 4 + 4 * g.num_cells * 4,
            transcendentals=0,
        ),
    )


def _ngp_dw2_is_dot(precision) -> bool:
    """The NGP fit kernel's dw2 layout follows mega_ngp's mode table, not
    the coordinate-MLP kernel's (round-4 A/B; see mega_ngp.py)."""
    from phys_autodiff_tpu.pallas.mega_ngp import _resolve_ngp_mode

    return _resolve_ngp_mode("dw2", precision) == "dot"


def ngp_fit_loss_and_grad(
    g: GridSpec,
    ncfg,
    params: dict,
    target_packed: jnp.ndarray,
    t,
    w: PhysWeights = PhysWeights(),
    precision: str = "f32",
    interpret=None,
):
    """(loss, (grad_params, grad_t)) of the weighted data MSE for an
    encoded field model (hash / Fourier / registered third-party families)
    from ONE kernel pass plus the scatter-free encoder VJP — the NGP twin
    of fit_loss_and_grad, sharing its target layout and loss doctrine.
    Gradient surface matches jax.grad of train.fit_field.data_loss."""
    from phys_autodiff_tpu.models.encoders import encode_grid_zcf

    if interpret is None:
        interpret = _default_interpret()
    assert fit_supported(g), "one-kernel fit needs ny*nx % 128 == 0"
    assert ncfg.out == 4, "kernel head is fixed to the 4 physics channels"
    lf = ncfg.encoding.out_dim
    h = ncfg.hidden
    t = jnp.float32(t)

    has_enc_params = any(
        leaf.size > 0 for leaf in jax.tree_util.tree_leaves(params["tables"])
    )
    # bf16 tier: the kernel truncates enc (and emits dEnc feeding a bf16-
    # class gradient) anyway, so the encoder fwd/VJP runs the family's fast
    # variant — measured as this step's dominant cost at HIGHEST.
    fast_enc = precision == "bf16"
    if has_enc_params:
        enc_zcf, enc_vjp = jax.vjp(
            lambda tb: encode_grid_zcf(ncfg.encoding, tb, g, fast=fast_enc),
            params["tables"],
        )  # [nz, LF, ny, nx]
    else:
        enc_zcf = encode_grid_zcf(
            ncfg.encoding, params["tables"], g, fast=fast_enc
        )
    m = g.ny * g.nx
    enc_k = enc_zcf.reshape(g.nz, lf, m // 128, 128)
    w1 = params["W1"]  # [LF+1, H]
    w1c = w1[:-1]
    tb1 = params["b1"][:, None] + w1[-1][:, None] * t  # [H, 1]
    w2t = params["W2"].T
    b2 = params["b2"].reshape(1, 4)
    call = _build_ngp_fit_call(
        g, lf, h, w, precision, interpret, need_denc=has_enc_params
    )
    outs = call(enc_k, w1c, w1c.T, tb1, w2t, params["W2"], b2, target_packed)
    if has_enc_params:
        parts, denc, dw1g, db1x, dw2g, db2x = outs
    else:
        parts, dw1g, db1x, dw2g, db2x = outs
    ls, lu = ops_loss.sum_partials(g, w, parts)
    db1 = db1x[:, 0]
    dw2 = dw2g.T if _ngp_dw2_is_dot(precision) else dw2g
    # single slice: the W1 time row's gradient is t * db1 exactly
    dw1_full = jnp.concatenate([dw1g, (t * db1)[None, :]], axis=0)
    if has_enc_params:
        denc_grid = denc.reshape(g.nz, lf, g.ny, g.nx)
        (d_tables,) = enc_vjp(denc_grid)
    else:
        d_tables = jax.tree.map(jnp.zeros_like, params["tables"])
    d_t = jnp.sum(w1[-1] * db1)
    grads = {
        "tables": d_tables,
        "W1": dw1_full,
        "b1": db1,
        "W2": dw2,
        "b2": db2x[:, 0],
    }
    return ls + lu, (grads, d_t)


def ngp_fit_loss_and_grad_sharded(
    g: GridSpec,
    ncfg,
    mesh,
    w: PhysWeights = PhysWeights(),
    precision: str = "f32",
    interpret=None,
):
    """Returns fn(params, target_packed, t) -> (loss, (grad_params,
    grad_t)) running the NGP fit kernel PER SHARD under shard_map: the
    encoder is shard-local (encode_grid_zcf_rows over exactly this
    shard's z rows — no halos, the data loss has no stencil), the target
    arrives z-sharded, dEnc pulls back through the shard-local encoder
    VJP with the partial d_tables psum'd, head-gradient partials psum'd,
    and the loss combined in fixed global order — sharded == single-chip
    at the 1e-7 doctrine. Nothing grid-sized is ever gathered."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from phys_autodiff_tpu.models.encoders import encode_grid_zcf_rows
    from phys_autodiff_tpu.parallel.mesh import Z_AXIS

    if interpret is None:
        interpret = _default_interpret()
    assert fit_supported(g), "one-kernel fit needs ny*nx % 128 == 0"
    assert ncfg.out == 4
    n_shards = mesh.shape[Z_AXIS]
    assert g.nz % n_shards == 0
    nz_local = g.nz // n_shards
    lf = ncfg.encoding.out_dim
    h = ncfg.hidden
    m = g.ny * g.nx

    def local(params, tgt_local, t):
        has_enc = any(
            leaf.size > 0
            for leaf in jax.tree_util.tree_leaves(params["tables"])
        )
        call = _build_ngp_fit_call(
            g, lf, h, w, precision, interpret, need_denc=has_enc,
            nz_local=nz_local,
        )
        t = jnp.float32(t)
        me = jax.lax.axis_index(Z_AXIS)
        rows = me * nz_local + jnp.arange(nz_local)
        fast_enc = precision == "bf16"  # same tier rule as the single-chip step
        if has_enc:
            enc_rows, enc_vjp = jax.vjp(
                lambda tb: encode_grid_zcf_rows(
                    ncfg.encoding, tb, g, rows, fast=fast_enc
                ),
                params["tables"],
            )  # [nz_local, LF, ny, nx]
        else:
            enc_rows = encode_grid_zcf_rows(
                ncfg.encoding, params["tables"], g, rows, fast=fast_enc
            )
        enc_k = enc_rows.reshape(nz_local, lf, m // 128, 128)
        w1 = params["W1"]
        w1c = w1[:-1]
        tb1 = params["b1"][:, None] + w1[-1][:, None] * t
        outs = call(
            enc_k, w1c, w1c.T, tb1, params["W2"].T, params["W2"],
            params["b2"].reshape(1, 4), tgt_local,
        )
        if has_enc:
            parts, denc, dw1g, db1x, dw2g, db2x = outs
        else:
            parts, dw1g, db1x, dw2g, db2x = outs
        parts_all = jax.lax.all_gather(parts, Z_AXIS, axis=1, tiled=True)
        ls, lu = ops_loss.sum_partials(g, w, parts_all)
        if has_enc:
            (d_tables_part,) = enc_vjp(
                denc.reshape(nz_local, lf, g.ny, g.nx)
            )
            d_tables = jax.lax.psum(d_tables_part, Z_AXIS)
        else:
            d_tables = jax.tree.map(jnp.zeros_like, params["tables"])
        db1 = jax.lax.psum(db1x, Z_AXIS)[:, 0]
        dw1g_s = jax.lax.psum(dw1g, Z_AXIS)
        dw2g_s = jax.lax.psum(dw2g, Z_AXIS)
        db2 = jax.lax.psum(db2x, Z_AXIS)[:, 0]
        dw2 = (
            dw2g_s.T if _ngp_dw2_is_dot(precision) else dw2g_s
        )
        grads = {
            "tables": d_tables,
            "W1": jnp.concatenate([dw1g_s, (t * db1)[None, :]], axis=0),
            "b1": db1,
            "W2": dw2,
            "b2": db2,
        }
        d_t = jnp.sum(w1[-1] * db1)
        return ls + lu, grads, d_t

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(Z_AXIS, None, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    tgt_sharding = NamedSharding(mesh, P(Z_AXIS, None, None))

    def loss_and_grad(params, target_packed, t):
        loss, d_params, d_t = sharded(params, target_packed, t)
        return loss, (d_params, d_t)

    loss_and_grad.target_sharding = tgt_sharding
    return loss_and_grad
