"""On-hardware parity sweep: runs the fused-vs-staged ladder compiled on the
real TPU (the pytest suite runs these in interpret mode on CPU; this script
is the hardware arm). Run from the repo root:

    PYTHONPATH=.:$PYTHONPATH python scripts/tpu_parity.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

# remote TPU compiles cost 1-2 min each; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.ops.stencil import FieldSnapshots
from phys_autodiff_tpu.pallas import (
    loss_backward_fused,
    loss_forward_fused,
    residuals_fused,
)
from phys_autodiff_tpu.pallas.mlp import generate_fields_fused
from phys_autodiff_tpu.models import fields as fields_mod
from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.ref import manufactured
from phys_autodiff_tpu.utils import tolerances as tol
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)
from phys_autodiff_tpu.utils.metrics import max_abs_err, rel_l2_err

L = 2 * np.pi
FAILURES = []


def check(name, err, bound):
    ok = err <= bound
    print(f"  {'PASS' if ok else 'FAIL'} {name}: {err:.3e} (<= {bound:.0e})")
    if not ok:
        FAILURES.append(name)


def run(nx, ny, nz, periodic):
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz,
                 dt=1e-3, periodic=periodic)
    print(f"grid {nx}x{ny}x{nz} periodic={periodic}")
    f = manufactured.solution2_fields(g, 0.7)
    fs = FieldSnapshots(**{k: jnp.asarray(v) for k, v in f.items()})
    w = PhysWeights(w_sigma=1.3, w_u=0.7)

    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    rs_f, ru_f = jax.jit(lambda x: residuals_fused(g, x))(fs)
    check("residuals R_sigma rel", rel_l2_err(rs_f, rs_s), tol.FUSED_VS_STAGED_REL)
    check("residuals R_u max", max_abs_err(ru_f, ru_s), tol.FUSED_VS_STAGED_MAX)

    gs_f, gu_f = jax.jit(lambda x: loss_backward_fused(g, w, x))(fs)
    gs_s, gu_s = ops.loss_backward(g, w, rs_s, ru_s)
    check("fused backward rel", rel_l2_err(gs_f, gs_s), tol.FUSED_VS_STAGED_REL)

    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls_f, lu_f = jax.jit(lambda x: loss_forward_fused(g, w, x))(fs)
    check("fused loss L_sigma rel",
          abs(float(ls_f) - float(ls64)) / abs(float(ls64)), 1e-6)
    check("fused loss L_u rel",
          abs(float(lu_f) - float(lu64)) / abs(float(lu64)), 1e-6)


def run_mlp(nx, ny, nz):
    g = GridSpec(nx=nx, ny=ny, nz=nz, dt=1e-3)
    cfg = MLPGridConfig(dims=MLPDims(H=128))
    params = mlp.init_params(cfg.dims, seed=777)
    print(f"mlp grid {nx}x{ny}x{nz} H=128")
    fs_p = jax.jit(lambda p: fields_mod.generate_fields(g, cfg, p, 0.25, g.dt))(params)
    fs_f = jax.jit(lambda p: generate_fields_fused(g, cfg, p, 0.25))(params)
    check("mlp fused sigma rel", rel_l2_err(fs_f.sigma_t, fs_p.sigma_t),
          tol.MLP_INFER_REL)
    check("mlp fused u rel", rel_l2_err(fs_f.u_t, fs_p.u_t), tol.MLP_INFER_REL)


def run_round2(nx, ny, nz):
    """Round-2 kernels on hardware: packed + upwind residuals, the
    MLP->residual->loss mega-kernel, and the fused backward mega-kernel."""
    from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline
    from phys_autodiff_tpu.pallas.mega_bwd import mega_loss_and_grad
    from phys_autodiff_tpu.pallas.residuals import (
        pack_fields,
        residuals_fused_packed,
    )

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz, dt=1e-3)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    print(f"round-2 kernels {nx}x{ny}x{nz}")
    f = manufactured.solution2_fields(g, 0.7)
    fs = FieldSnapshots(**{k: jnp.asarray(v) for k, v in f.items()})
    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    out = jax.jit(lambda p: residuals_fused_packed(g, p))(pack_fields(fs))
    check("packed residuals rel", rel_l2_err(out[0], rs_s), tol.FUSED_VS_STAGED_REL)
    check("packed residuals R_u rel", rel_l2_err(out[1:], ru_s),
          tol.FUSED_VS_STAGED_REL)

    gu_spec = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz,
                       dt=1e-3, scheme="upwind")
    rs_u, ru_u = jax.jit(lambda x: ops.residuals(gu_spec, x))(fs)
    out_u = jax.jit(lambda p: residuals_fused_packed(gu_spec, p))(pack_fields(fs))
    check("upwind packed rel", rel_l2_err(out_u[0], rs_u), tol.FUSED_VS_STAGED_REL)

    cfg = MLPGridConfig(dims=MLPDims(H=128))
    params = mlp.init_params(cfg.dims, seed=777)
    t = jnp.float32(0.25)

    def staged_terms(p):
        f2 = fields_mod.generate_fields(g, cfg, p, t, g.dt)
        return ops.loss_forward(g, w, f2)

    ls_r, lu_r = jax.jit(staged_terms)(params)
    ls_m, lu_m = jax.jit(lambda p: mega_loss_pipeline(g, w, cfg, p, t))(params)
    check("mega loss L_sigma rel",
          abs(float(ls_m) - float(ls_r)) / abs(float(ls_r)), 1e-5)
    check("mega loss L_u rel",
          abs(float(lu_m) - float(lu_r)) / abs(float(lu_r)), 1e-5)

    def staged_total(p, tt):
        f2 = fields_mod.generate_fields(g, cfg, p, tt, g.dt)
        return ops.total_loss(g, w, f2)

    l_ref, gp_ref = jax.jit(jax.value_and_grad(staged_total))(params, t)
    l_b, (gp_b, _) = jax.jit(
        lambda p, tt: mega_loss_and_grad(g, w, cfg, p, tt)
    )(params, t)
    check("mega-bwd loss rel", abs(float(l_b) - float(l_ref)) / abs(float(l_ref)),
          1e-5)
    cat = lambda gp: np.concatenate(
        [np.asarray(gp[k], np.float64).ravel() for k in sorted(gp)]
    )
    check("mega-bwd grads rel (global)", rel_l2_err(cat(gp_b), cat(gp_ref)), 1e-4)


def run_flat(nx, ny, nz, periodic=True, scheme="central"):
    """Flat-layout kernels (lane-aligned one-DMA path for nx % 128 != 0) on
    hardware: residuals, loss fwd/bwd, and the flat MLP pipeline."""
    import dataclasses

    from phys_autodiff_tpu.pallas.mlp import generate_fields_fused_flat
    from phys_autodiff_tpu.pallas.residuals import (
        grid_to_flat,
        loss_backward_fused_flat,
        loss_forward_fused_flat,
        pack_fields,
        pack_fields_flat,
        residuals_fused_flat,
    )

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz,
                 dt=1e-3, periodic=periodic, scheme=scheme)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    print(f"flat kernels {nx}x{ny}x{nz} periodic={periodic} {scheme}")
    f = manufactured.solution2_fields(g, 0.7)
    fs = FieldSnapshots(**{k: jnp.asarray(v) for k, v in f.items()})
    flat = pack_fields_flat(g, fs)

    rs_s, ru_s = jax.jit(lambda x: ops.residuals(g, x))(fs)
    ref = grid_to_flat(g, jnp.concatenate([rs_s[None], ru_s], axis=0))
    out = jax.jit(lambda p: residuals_fused_flat(g, p))(flat)
    check("flat residuals rel", rel_l2_err(out, ref), tol.FUSED_VS_STAGED_REL)
    check("flat residuals max", max_abs_err(out, ref), tol.FUSED_VS_STAGED_MAX)

    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls_f, lu_f = jax.jit(lambda p: loss_forward_fused_flat(g, w, p))(flat)
    check("flat loss L_sigma rel",
          abs(float(ls_f) - float(ls64)) / abs(float(ls64)), 1e-6)
    check("flat loss L_u rel",
          abs(float(lu_f) - float(lu64)) / abs(float(lu64)), 1e-6)

    gs_s, gu_s = ops.loss_backward(g, w, rs_s, ru_s)
    refb = grid_to_flat(g, jnp.concatenate([gs_s[None], gu_s], axis=0))
    gb = jax.jit(lambda p: loss_backward_fused_flat(g, w, p))(flat)
    check("flat backward rel", rel_l2_err(gb, refb), tol.FUSED_VS_STAGED_REL)

    cfg = MLPGridConfig(dims=MLPDims(H=128))
    params = mlp.init_params(cfg.dims, seed=777)
    gen = jax.jit(lambda p: generate_fields_fused_flat(g, cfg, p, 0.25))(params)
    gen_ref = grid_to_flat(
        g, pack_fields(fields_mod.generate_fields(g, cfg, params, 0.25, g.dt))
    )
    check("flat mlp fieldgen rel", rel_l2_err(gen, gen_ref), tol.MLP_INFER_REL)


def run_padlanes(nx, ny, nz, periodic=True, scheme="central"):
    """Round-5 halo-padded-lane kernels (the fast unaligned-nx arm at pad
    ratio <= 1.5) on hardware: residuals vs the flat kernel (exact-bitwise
    expected — identical per-element arithmetic; checked at the doctrine
    bound), loss forward vs the f64 host reduction."""
    from phys_autodiff_tpu.pallas.residuals import (
        flat_to_grid,
        loss_forward_fused_padlanes,
        pack_fields_flat,
        pack_fields_pad,
        pad_to_grid,
        residuals_fused_flat,
        residuals_fused_padlanes,
    )

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz,
                 dt=1e-3, periodic=periodic, scheme=scheme)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    print(f"padlanes kernels {nx}x{ny}x{nz} periodic={periodic} {scheme}")
    f = manufactured.solution2_fields(g, 0.7)
    fs = FieldSnapshots(**{k: jnp.asarray(v) for k, v in f.items()})
    padded = pack_fields_pad(g, fs)

    out = pad_to_grid(g, jax.jit(
        lambda p: residuals_fused_padlanes(g, p))(padded))
    ref = flat_to_grid(g, jax.jit(
        lambda p: residuals_fused_flat(g, p))(pack_fields_flat(g, fs)))
    tag = f"{scheme}{'' if periodic else '-clamp'}"
    check(f"padlanes[{tag}] residuals rel", rel_l2_err(out, ref),
          tol.FUSED_VS_STAGED_REL)
    check(f"padlanes[{tag}] residuals max", max_abs_err(out, ref),
          tol.FUSED_VS_STAGED_MAX)

    ls64, lu64 = ops.loss_forward_f64(g, w, fs)
    ls_p, lu_p = jax.jit(lambda p: loss_forward_fused_padlanes(g, w, p))(padded)
    check(f"padlanes[{tag}] loss L_sigma rel",
          abs(float(ls_p) - float(ls64)) / abs(float(ls64)), 1e-6)
    check(f"padlanes[{tag}] loss L_u rel",
          abs(float(lu_p) - float(lu64)) / abs(float(lu64)), 1e-6)


def run_round3(nx, ny, nz, periodic=True, scheme="central"):
    """Round-3 kernels on hardware: the backward mega-kernel in its FLAT
    layout (unaligned nx) and/or with the hand-derived UPWIND adjoint,
    against jax.grad of the staged loss."""
    from phys_autodiff_tpu.pallas.mega_bwd import (
        mega_flat,
        mega_loss_and_grad,
        mega_supported,
    )

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz,
                 dt=1e-3, periodic=periodic, scheme=scheme)
    assert mega_supported(g)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    print(f"round-3 mega-bwd {nx}x{ny}x{nz} periodic={periodic} {scheme} "
          f"flat={mega_flat(g)}")
    cfg = MLPGridConfig(dims=MLPDims(H=128))
    params = mlp.init_params(cfg.dims, seed=777)
    t = jnp.float32(0.25)

    def staged_total(p, tt):
        f2 = fields_mod.generate_fields(g, cfg, p, tt, g.dt)
        return ops.total_loss(g, w, f2)

    l_ref, gp_ref = jax.jit(jax.value_and_grad(staged_total))(params, t)
    l_b, (gp_b, _) = jax.jit(
        lambda p, tt: mega_loss_and_grad(g, w, cfg, p, tt)
    )(params, t)
    tag = f"{scheme}{'-flat' if mega_flat(g) else ''}"
    # Tolerance calibration: this compares two FLOAT32 arms of the same
    # exact-arithmetic function, so the bound is the f32 agreement floor,
    # not an accuracy statement. Clamp mode is ill-conditioned (loss ~25x
    # smaller than periodic, near-cancelling gradient contributions):
    # f64 adjudication (tests/test_f64_adjudication.py, ref/f64_grad.py)
    # shows BOTH arms sit ~1e-3 from the true gradient there while
    # agreeing with each other only to a few 1e-4 — and the kernel is the
    # closer of the two to the truth at every adjudicated config.
    loss_tol = 1e-5 if periodic else 5e-5
    grads_tol = 1e-4 if periodic and not mega_flat(g) else (
        5e-4 if periodic else 5e-3
    )
    check(f"mega-bwd[{tag}] loss rel",
          abs(float(l_b) - float(l_ref)) / abs(float(l_ref)), loss_tol)
    cat = lambda gp: np.concatenate(
        [np.asarray(gp[k], np.float64).ravel() for k in sorted(gp)]
    )
    check(f"mega-bwd[{tag}] grads rel", rel_l2_err(cat(gp_b), cat(gp_ref)),
          grads_tol)


def run_ngp_dense(nx, ny, nz):
    """Round-3 NGP dense-level encoder on hardware: the matmul-resampled
    grid encoding equals the pointwise encoder (small grid — the pointwise
    path is guarded at grid scale) and its gradient is scatter-free."""
    from phys_autodiff_tpu.models import ngp
    from phys_autodiff_tpu.models.hash_encoder import encode, encode_grid
    from phys_autodiff_tpu.models.ngp import _unit_coords

    g = GridSpec(nx=nx, ny=ny, nz=nz, dt=1e-3)
    ncfg = ngp.NGPFieldConfig()
    assert ncfg.encoding.dense_levels(), "default NGP config must be dense"
    print(f"round-3 ngp dense encoder {nx}x{ny}x{nz} "
          f"dense_levels={ncfg.encoding.dense_levels()}")
    params = ngp.init_ngp_params(ncfg, seed=777)
    out = jax.jit(lambda p: encode_grid(ncfg.encoding, p["tables"], g))(params)
    ref = jax.jit(
        lambda p: encode(ncfg.encoding, p["tables"], _unit_coords(g))
    )(params)
    check("ngp dense encode_grid rel", rel_l2_err(out, ref), 2e-5)

    def loss(p):
        return jnp.sum(encode_grid(ncfg.encoding, p["tables"], g) ** 2)

    gr = jax.jit(jax.grad(loss))(params)
    flat_norm = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(gr))
    )
    check("ngp dense grad finite/nonzero", 0.0 if flat_norm > 0 else 1.0, 0.5)


def run_ngp_mega(nx, ny, nz, scheme="central"):
    """Round-3 NGP backward mega-kernel on hardware vs jax.value_and_grad
    through the staged pipeline (tests/test_mega_ngp.py is the interpret
    arm). Conditioned params: the paper-init tables leave every gradient at
    the f32 noise floor where relative comparison is meaningless."""
    from phys_autodiff_tpu.models import ngp
    from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3,
                 scheme=scheme)
    print(f"round-3 ngp mega-bwd {nx}x{ny}x{nz} {scheme}")
    ncfg = ngp.NGPFieldConfig()
    params = ngp.init_ngp_params(ncfg, seed=777)
    rng = np.random.Generator(np.random.MT19937(21))
    params["tables"] = jax.tree_util.tree_map(
        lambda a: a * 2000.0, params["tables"]
    )
    params["b1"] = jnp.asarray(
        rng.standard_normal(params["b1"].shape) * 0.3, jnp.float32
    )
    params["b2"] = jnp.asarray(
        rng.standard_normal(params["b2"].shape) * 0.3, jnp.float32
    )
    t = jnp.float32(0.25)

    w = PhysWeights()

    def staged_total(p, tt):
        fs = ngp.generate_fields(g, ncfg, p, tt, g.dt)
        ls, lu = ops.loss_forward(g, w, fs)
        return ls + lu

    l_ref, g_ref = jax.jit(jax.value_and_grad(staged_total))(params, t)
    cat = lambda gp: np.concatenate(
        [np.asarray(x, np.float64).ravel()
         for x in jax.tree_util.tree_leaves(gp)]
    )
    from phys_autodiff_tpu.pallas import mega_ngp

    for variant in ("base", "fused", "fused2"):  # stage-3 head-backward forms
        mega_ngp._HEAD_VARIANT = variant
        l_k, (g_k, _) = jax.jit(
            lambda p, tt: ngp_loss_and_grad(g, w, ncfg, p, tt)
        )(params, t)
        check(f"ngp-mega[{variant}] loss rel",
              abs(float(l_k) - float(l_ref)) / abs(float(l_ref)), 1e-5)
        check(f"ngp-mega[{variant}] grads rel",
              rel_l2_err(cat(g_k), cat(g_ref)), 2e-3)
    mega_ngp._HEAD_VARIANT = "auto"


def run_fourier_mega(nx, ny, nz):
    """Round-3 Fourier-encoded field family through the same one-kernel
    backward (need_denc=False path: no dEnc output, large-LF dot forward)
    vs jax.value_and_grad through the staged pipeline
    (tests/test_fourier.py is the interpret arm)."""
    from phys_autodiff_tpu.models import ngp
    from phys_autodiff_tpu.models.fourier import FourierEncodingConfig
    from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    print(f"round-3 fourier mega-bwd {nx}x{ny}x{nz}")
    ncfg = ngp.NGPFieldConfig(encoding=FourierEncodingConfig())
    params = ngp.init_ngp_params(ncfg, seed=777)
    rng = np.random.Generator(np.random.MT19937(21))
    params["b1"] = jnp.asarray(
        rng.standard_normal(params["b1"].shape) * 0.3, jnp.float32
    )
    params["b2"] = jnp.asarray(
        rng.standard_normal(params["b2"].shape) * 0.3, jnp.float32
    )
    t = jnp.float32(0.25)
    w = PhysWeights()

    def staged_total(p, tt):
        fs = ngp.generate_fields(g, ncfg, p, tt, g.dt)
        ls, lu = ops.loss_forward(g, w, fs)
        return ls + lu

    l_ref, g_ref = jax.jit(jax.value_and_grad(staged_total))(params, t)
    cat = lambda gp: np.concatenate(
        [np.asarray(x, np.float64).ravel()
         for x in jax.tree_util.tree_leaves(gp)]
    )
    l_k, (g_k, _) = jax.jit(
        lambda p, tt: ngp_loss_and_grad(g, w, ncfg, p, tt)
    )(params, t)
    check("fourier-mega loss rel",
          abs(float(l_k) - float(l_ref)) / abs(float(l_ref)), 1e-5)
    check("fourier-mega grads rel", rel_l2_err(cat(g_k), cat(g_ref)), 2e-3)


def run_f64_encoded(nx, ny, nz, scheme="central", fourier=False):
    """Round-5: f64 TRUTH adjudication of the encoded-family gradients on
    hardware (round-4 VERDICT #3). The ngp-mega/fourier-mega checks above
    compare two f32 arms against each other — which cannot tell WHICH arm
    an observed gap belongs to. Here both arms (the kernel and jax.grad of
    the staged pipeline, both compiled on the TPU) are graded against the
    independent float64 replica (ref/f64_grad.f64_encoded_loss_and_grad,
    computed on the host CPU device): the kernel passes if its distance to
    the truth is no worse than jax.grad's own x 2.5 (the kernel computes
    dEnc in H-chunks and pulls it back through the encoder VJP separately —
    a different association; CPU-measured ratios 1.42-1.96), plus an
    absolute f32-noise-class cap. Tolerance doctrine anchor:
    /root/reference/REQUIREMENT.md:196-203."""
    from phys_autodiff_tpu.models import ngp
    from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad
    from phys_autodiff_tpu.ref.f64_grad import f64_encoded_loss_and_grad

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3,
                 scheme=scheme)
    tag = "fourier" if fourier else f"ngp-{scheme}"
    print(f"f64 truth adjudication [{tag}] {nx}x{ny}x{nz}")
    if fourier:
        from phys_autodiff_tpu.models.fourier import FourierEncodingConfig

        ncfg = ngp.NGPFieldConfig(encoding=FourierEncodingConfig())
    else:
        ncfg = ngp.NGPFieldConfig()
    params = ngp.init_ngp_params(ncfg, seed=777)
    rng = np.random.Generator(np.random.MT19937(21))
    if not fourier:
        params["tables"] = jax.tree_util.tree_map(
            lambda a: a * 2000.0, params["tables"]
        )
    params["b1"] = jnp.asarray(
        rng.standard_normal(params["b1"].shape) * 0.3, jnp.float32
    )
    params["b2"] = jnp.asarray(
        rng.standard_normal(params["b2"].shape) * 0.3, jnp.float32
    )
    t = jnp.float32(0.25)
    w = PhysWeights()

    def staged_total(p, tt):
        fs = ngp.generate_fields(g, ncfg, p, tt, g.dt)
        ls, lu = ops.loss_forward(g, w, fs)
        return ls + lu

    l_ref, g_ref = jax.jit(jax.value_and_grad(staged_total))(params, t)
    l_k, (g_k, _) = jax.jit(
        lambda p, tt: ngp_loss_and_grad(g, w, ncfg, p, tt)
    )(params, t)
    # f64 truth on the host CPU device (the TPU has no f64)
    with jax.default_device(jax.devices("cpu")[0]):
        l64, gp64 = f64_encoded_loss_and_grad(g, w, ncfg, params, float(t))
    cat = lambda gp: np.concatenate(
        [np.asarray(x, np.float64).ravel()
         for x in jax.tree_util.tree_leaves(gp)]
    )
    truth = cat(gp64)
    d_jax = rel_l2_err(cat(g_ref), truth)
    d_kernel = rel_l2_err(cat(g_k), truth)
    s_err = abs(float(l_ref) - l64) / abs(l64)
    k_err = abs(float(l_k) - l64) / abs(l64)
    check(f"{tag} staged loss vs truth", s_err, 1e-4)
    check(f"{tag} kernel loss vs truth", k_err, max(5.0 * s_err, 1e-6))
    check(f"{tag} jax.grad dist to truth", d_jax, 1e-2)
    check(f"{tag} kernel truth-dist <= 2.5x jax.grad's",
          d_kernel, max(2.5 * d_jax, 1e-6))
    # absolute CLASS cap only: the f32 noise floor depends on grid size and
    # conditioning (measured 2026-08-20 at 64^3: ngp-central 8.2e-6 — 25x
    # CLOSER to truth than jax.grad's 2.1e-4; fourier 1.298e-4 vs
    # jax.grad's 1.305e-4, i.e. marginally closer), so the floor-tracking
    # bound is the 2.5x criterion above and this one only rejects a
    # wrong-gradient class.
    check(f"{tag} kernel truth-dist absolute", d_kernel, 1e-3)


def run_transport(nx, ny, nz, periodic=True):
    """Session-3 transport kernels (pallas/transport.py) vs the XLA
    split step (apps/transport.py) — bit-exactness observed on hardware;
    bound kept at 1e-6 for fp headroom."""
    from phys_autodiff_tpu.apps import transport as tr
    from phys_autodiff_tpu.pallas.transport import (
        transport_step_fused,
        transport_step_fused_pre,
        transport_weights,
    )

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3,
                 periodic=periodic)
    print(f"transport kernels {nx}x{ny}x{nz} periodic={periodic}")
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    u = jnp.asarray(
        (rng.uniform(-0.8, 0.8, size=(3,) + g.shape)
         * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / g.dt
         ).astype(np.float32)
    )
    ref = np.asarray(jax.jit(lambda s: tr.transport_step(g, s, u, g.dt))(sigma))
    out = np.asarray(
        jax.jit(lambda s: transport_step_fused(g, s, u, g.dt))(sigma)
    )
    outp = np.asarray(jax.jit(
        lambda s: transport_step_fused_pre(
            g, s, transport_weights(g, u, g.dt)
        )
    )(sigma))
    check("transport slab kernel max", float(np.max(np.abs(out - ref))), 1e-6)
    check("transport pre kernel max", float(np.max(np.abs(outp - ref))), 1e-6)


def run_projection(nx, ny, nz):
    """Divergence-free projection (ops/projection.py) on hardware: the FFT
    projector must drive the framework's own discrete divergence to f32
    rounding on periodic boxes; the curl-potential head must be solenoidal
    to relative rounding under clamp; CGNR must cut clamp divergence by a
    large factor. Same relative thresholds as tests/test_projection.py."""
    from phys_autodiff_tpu.apps import euler
    from phys_autodiff_tpu.ops import diagnostics, projection

    print(f"projection {nx}x{ny}x{nz}")
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(3,) + g.shape).astype(np.float32))
    u_p = jax.jit(lambda v: projection.project_fft(g, v))(u)
    before = float(jnp.max(jnp.abs(diagnostics.divergence(g, u))))
    after = float(jnp.max(jnp.abs(diagnostics.divergence(g, u_p))))
    check("fft projection div reduction", after / before, 2e-5)
    u_pp = jax.jit(lambda v: projection.project_fft(g, v))(u_p)
    check("fft projection idempotent rel", rel_l2_err(u_pp, u_p), 1e-5)

    gc = GridSpec(nx=nx // 2, ny=ny // 2, nz=nz // 2, hx=0.05, hy=0.05,
                  hz=0.05, dt=1e-3, periodic=False)
    A = jnp.asarray(rng.normal(size=(3,) + gc.shape).astype(np.float32))
    u_pot = jax.jit(lambda a: projection.velocity_from_potential(gc, a))(A)
    scale = float(jnp.max(jnp.abs(u_pot))) / min(gc.hx, gc.hy, gc.hz)
    dpot = float(jnp.max(jnp.abs(diagnostics.divergence(gc, u_pot))))
    check("curl-potential clamp div rel", dpot / scale, 1e-5)

    uc = jnp.asarray(rng.normal(size=(3,) + gc.shape).astype(np.float32))
    uc_p = jax.jit(
        lambda v: projection.project_cg(gc, v, maxiter=200)
    )(uc)
    bc = float(jnp.max(jnp.abs(diagnostics.divergence(gc, uc))))
    ac = float(jnp.max(jnp.abs(diagnostics.divergence(gc, uc_p))))
    check("cg clamp projection reduction", ac / bc, 1.0 / 30.0)

    # one Euler step at the parity grid stays finite + solenoidal
    sigma0 = jnp.asarray(
        rng.uniform(size=g.shape).astype(np.float32)
    )
    cfg = euler.EulerConfig(dt=2e-3, steps=5, buoyancy=0.5)
    final, diag = jax.jit(
        lambda s: euler.rollout(g, s, cfg)
    )(euler.EulerState(sigma0, u_p))
    fin = float(jnp.all(jnp.isfinite(final.sigma))
                & jnp.all(jnp.isfinite(final.u)))
    check("euler rollout finite", 1.0 - fin, 0.5)
    check("euler rollout max|div|",
          float(jnp.max(diag["max_abs_div"])) / before, 2e-4)


def run_session5(nx, ny, nz):
    """Session-5 surfaces on hardware: limited MacCormack (2nd order —
    must beat first-order SL by >= 2x on a smooth translation and keep
    the max principle), the batched multi-scalar step (bitwise equal to
    per-component), vorticity confinement (orthogonal to omega), and the
    solenoidal vector-potential head (discrete div to rounding, training
    step finite). Thresholds mirror the CPU tests."""
    from phys_autodiff_tpu.apps import euler
    from phys_autodiff_tpu.apps import transport as tr
    from phys_autodiff_tpu.models import mlp as mlp_mod
    from phys_autodiff_tpu.models import solenoidal
    from phys_autodiff_tpu.ops import diagnostics
    from phys_autodiff_tpu.utils.config import MLPDims, MLPGridConfig

    print(f"session-5 apps {nx}x{ny}x{nz}")
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    rng = np.random.default_rng(11)
    zz, yy, xx = np.meshgrid(
        np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij")
    blob = np.exp(-(((xx - nx // 2) / 10.0) ** 2
                    + ((yy - ny // 2) / 10.0) ** 2
                    + ((zz - nz // 2) / 10.0) ** 2)).astype(np.float32)
    sigma0 = jnp.asarray(blob)
    dt, off, steps = 2e-3, 0.4, 25
    u = jnp.broadcast_to(
        jnp.asarray([off * g.hx / dt, 0, 0], jnp.float32)[
            :, None, None, None], (3,) + g.shape)
    exact = jnp.asarray(np.exp(
        -(((xx - nx // 2 - off * steps) / 10.0) ** 2
          + ((yy - ny // 2) / 10.0) ** 2
          + ((zz - nz // 2) / 10.0) ** 2)).astype(np.float32))
    sl, _ = jax.jit(lambda s: tr.transport(
        g, s, u, tr.TransportConfig(dt=dt, steps=steps)))(sigma0)
    mc, _ = jax.jit(lambda s: tr.transport(
        g, s, u, tr.TransportConfig(dt=dt, steps=steps,
                                    scheme="maccormack")))(sigma0)
    e_sl = float(jnp.linalg.norm(sl - exact))
    e_mc = float(jnp.linalg.norm(mc - exact))
    check("maccormack vs sl error ratio", e_mc / e_sl, 0.5)
    check("maccormack max principle",
          max(float(jnp.max(mc)) - float(jnp.max(sigma0)),
              float(jnp.min(sigma0)) - float(jnp.min(mc)), 0.0), 1e-5)
    # batched == per-component, bitwise, on hardware
    fields = jnp.asarray(
        rng.normal(size=(3,) + g.shape).astype(np.float32))
    ur = jnp.asarray(
        (rng.uniform(-0.9, 0.9, size=(3,) + g.shape)
         * np.array([g.hx, g.hy, g.hz])[:, None, None, None] / dt
         ).astype(np.float32))
    many = jax.jit(
        lambda f, v: tr.maccormack_step_many(g, f, v, dt))(fields, ur)
    one = jax.jit(lambda s, v: tr.maccormack_step(g, s, v, dt))
    per = jnp.stack([one(fields[c], ur) for c in range(3)])
    check("batched maccormack bitwise",
          float(jnp.max(jnp.abs(many - per))), 0.0)
    # confinement force orthogonal to vorticity
    f_conf = jax.jit(
        lambda v: euler.vorticity_confinement(g, v, 2.0))(ur)
    w = diagnostics.curl(g, ur)
    scale = (float(jnp.max(jnp.abs(f_conf))) * float(jnp.max(jnp.abs(w)))
             + 1e-30)
    check("confinement orthogonal to omega",
          float(jnp.max(jnp.abs(jnp.sum(f_conf * w, axis=0)))) / scale,
          1e-4)
    # solenoidal head: discrete div to rounding at the parity grid
    mcfg = MLPGridConfig(dims=MLPDims(H=64))
    params = mlp_mod.init_params(mcfg.dims, seed=5, scale=0.5)
    _, u_sol = solenoidal.grid_infer_solenoidal(g, mcfg, params, 0.3)
    umax = float(jnp.max(jnp.abs(u_sol))) + 1e-30
    check("solenoidal head div/|u|",
          float(jnp.max(jnp.abs(diagnostics.divergence(g, u_sol)))) / umax,
          1e-5)


def run_fit(nx, ny, nz):
    """Session-7 arm: the one-kernel supervised-fit step (pallas/fit.py)
    against jax.grad of the staged data loss, on hardware."""
    from phys_autodiff_tpu.pallas import fit as pfit
    from phys_autodiff_tpu.train import fit_field as ff

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz, dt=1e-3)
    print(f"fit kernel {nx}x{ny}x{nz} H=128")
    cfg = MLPGridConfig(dims=MLPDims(H=128))
    params = mlp.init_params(cfg.dims, seed=11)
    f = manufactured.solution2_fields(g, 0.7)
    tgt = ff.FitTarget(jnp.asarray(f["sigma_t"]), jnp.asarray(f["u_t"]), 0.3)
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    l_k, (gp_k, _) = jax.jit(
        lambda p: pfit.fit_loss_and_grad(g, cfg, p, packed, tgt.t, w)
    )(params)
    l_x, gp_x = jax.jit(
        jax.value_and_grad(lambda p: ff.data_loss(g, cfg, p, tgt, w))
    )(params)
    check("fit loss rel", abs(float(l_k) - float(l_x)) / abs(float(l_x)), 1e-5)
    cat = lambda gp: np.concatenate(
        [np.asarray(gp[k], np.float64).ravel() for k in sorted(gp)]
    )
    check("fit grads rel (global)", rel_l2_err(cat(gp_k), cat(gp_x)), 1e-4)


def run_fit_ngp(nx, ny, nz):
    """The NGP fused fit step (dense default config) vs jax.grad of the
    staged data loss, on hardware."""
    import jax.flatten_util

    from phys_autodiff_tpu.models.ngp import NGPFieldConfig
    from phys_autodiff_tpu.pallas import fit as pfit
    from phys_autodiff_tpu.train import fit_field as ff

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz, dt=1e-3)
    print(f"ngp fit kernel {nx}x{ny}x{nz}")
    ncfg = NGPFieldConfig()
    params = ff.init_any(ncfg, seed=13)
    f = manufactured.solution2_fields(g, 0.7)
    tgt = ff.FitTarget(jnp.asarray(f["sigma_t"]), jnp.asarray(f["u_t"]), 0.3)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    l_k, (gp_k, _) = jax.jit(
        lambda p: pfit.ngp_fit_loss_and_grad(g, ncfg, p, packed, tgt.t)
    )(params)
    l_x, gp_x = jax.jit(
        jax.value_and_grad(lambda p: ff.data_loss(g, ncfg, p, tgt))
    )(params)
    check("ngp fit loss rel",
          abs(float(l_k) - float(l_x)) / abs(float(l_x)), 1e-5)
    fk, _ = jax.flatten_util.ravel_pytree(gp_k)
    fx, _ = jax.flatten_util.ravel_pytree(gp_x)
    check("ngp fit grads rel (global)",
          rel_l2_err(np.asarray(fk, np.float64), np.asarray(fx, np.float64)),
          1e-4)


def run_fast_encoder(nx, ny, nz):
    """Round-3 fast-encoder tier: the hash family's DEFAULT-precision
    resample (encode_grid_zcf fast=True — what the bf16-tier kernels feed
    on) stays within the bf16 5e-2 doctrine of the exact HIGHEST encode,
    the shard-rows variant matches the grid variant at the shard's rows,
    and the bf16 NGP fit step that consumes it keeps loss/grad parity
    class vs jax.grad of the staged data loss. On CPU DEFAULT == HIGHEST,
    so only this hardware arm can see the precision split."""
    import jax.flatten_util

    from phys_autodiff_tpu.models import encoders
    from phys_autodiff_tpu.models.ngp import NGPFieldConfig
    from phys_autodiff_tpu.pallas import fit as pfit
    from phys_autodiff_tpu.train import fit_field as ff

    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=L / nx, hy=L / ny, hz=L / nz, dt=1e-3)
    print(f"fast encoder tier {nx}x{ny}x{nz}")
    ncfg = NGPFieldConfig()
    params = ff.init_any(ncfg, seed=13)
    enc_exact = jax.jit(
        lambda tb: encoders.encode_grid_zcf(ncfg.encoding, tb, g)
    )(params["tables"])
    enc_fast = jax.jit(
        lambda tb: encoders.encode_grid_zcf(ncfg.encoding, tb, g, fast=True)
    )(params["tables"])
    check("fast encode vs exact rel",
          rel_l2_err(np.asarray(enc_fast, np.float64),
                     np.asarray(enc_exact, np.float64)), 5e-2)
    rows = jnp.arange(nz // 4, nz // 4 + nz // 8, dtype=jnp.int32)
    enc_rows = jax.jit(
        lambda tb: encoders.encode_grid_zcf_rows(
            ncfg.encoding, tb, g, rows, fast=True)
    )(params["tables"])
    check("fast rows vs fast grid rel",
          rel_l2_err(np.asarray(enc_rows, np.float64),
                     np.asarray(enc_fast, np.float64)[np.asarray(rows)]),
          1e-6)
    f = manufactured.solution2_fields(g, 0.7)
    tgt = ff.FitTarget(jnp.asarray(f["sigma_t"]), jnp.asarray(f["u_t"]), 0.3)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)
    l_k, (gp_k, _) = jax.jit(
        lambda p: pfit.ngp_fit_loss_and_grad(
            g, ncfg, p, packed, tgt.t, precision="bf16")
    )(params)
    l_x, gp_x = jax.jit(
        jax.value_and_grad(lambda p: ff.data_loss(g, ncfg, p, tgt))
    )(params)
    check("bf16 ngp fit loss rel",
          abs(float(l_k) - float(l_x)) / abs(float(l_x)), 5e-2)
    fk, _ = jax.flatten_util.ravel_pytree(gp_k)
    fx, _ = jax.flatten_util.ravel_pytree(gp_x)
    check("bf16 ngp fit grads rel (global)",
          rel_l2_err(np.asarray(fk, np.float64), np.asarray(fx, np.float64)),
          5e-2)


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(128, 96, 96, True)   # slab kernel
    run(128, 96, 96, False)
    run(96, 96, 64, True)    # plane kernel
    run(64, 64, 64, False)
    run_mlp(128, 96, 96)
    run_round2(128, 96, 96)
    run_flat(96, 96, 64)
    run_flat(64, 64, 64, periodic=False)
    run_flat(64, 64, 64, scheme="upwind")
    run_padlanes(96, 96, 64)                    # round-5 halo-padded arm
    run_padlanes(96, 96, 64, periodic=False)
    run_padlanes(96, 96, 64, scheme="upwind")
    run_round3(64, 64, 64)                      # flat backward mega-kernel
    run_round3(96, 96, 64, periodic=False)      # flat + clamp
    run_round3(128, 96, 96, scheme="upwind")    # upwind adjoint, shaped
    run_round3(64, 64, 64, scheme="upwind")     # upwind adjoint, flat
    run_ngp_dense(32, 16, 16)
    run_ngp_mega(128, 96, 96)
    run_fourier_mega(128, 96, 96)
    run_f64_encoded(64, 64, 64, scheme="central")
    run_f64_encoded(64, 64, 64, scheme="upwind")
    run_f64_encoded(64, 64, 64, fourier=True)
    run_transport(128, 96, 96, True)
    run_transport(128, 96, 96, False)
    run_projection(128, 96, 96)
    run_session5(128, 96, 96)
    run_fit(128, 96, 96)     # one-kernel fit step, aligned plane
    run_fit(96, 96, 64)      # unaligned nx (flat M rows)
    run_fit_ngp(128, 96, 96)  # NGP fused fit step
    run_fast_encoder(128, 96, 96)  # bf16-tier DEFAULT-precision encoder
    if FAILURES:
        print("FAILURES:", FAILURES)
        sys.exit(1)
    print("ALL PASS")
