"""Tests for train/fit_field.py — supervised neural-field fitting.

Covers: the data-loss semantics (mirrors the physics loss's weighted-MSE
doctrine), the family-agnostic dispatch (MLP + hash-NGP through one API),
the PINN composite loss, the PSNR/compression reporting, and the full
export -> load -> fit round trip with utils/export."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.models import fields as fields_mod
from phys_autodiff_tpu.models import sample
from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig
from phys_autodiff_tpu.models.ngp import NGPFieldConfig
from phys_autodiff_tpu.train import TrainConfig, fit_field as ff
from phys_autodiff_tpu.utils import export
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)


def _grid(nx=10, ny=8, nz=6):
    return GridSpec(nx=nx, ny=ny, nz=nz, hx=0.2, hy=0.2, hz=0.2, dt=1e-3)


def _smooth_target(g, t=0.25):
    """A smooth, realizable-scale target: low-frequency trig fields."""
    z, y, x = jnp.meshgrid(
        jnp.arange(g.nz), jnp.arange(g.ny), jnp.arange(g.nx), indexing="ij"
    )
    xs, ys, zs = x / g.nx, y / g.ny, z / g.nz
    sigma = 0.5 * jnp.sin(2 * jnp.pi * xs) * jnp.cos(2 * jnp.pi * ys)
    u = jnp.stack(
        [
            0.3 * jnp.cos(2 * jnp.pi * zs),
            0.2 * jnp.sin(2 * jnp.pi * xs),
            0.1 * jnp.ones_like(xs),
        ]
    )
    return ff.FitTarget(sigma.astype(jnp.float32), u.astype(jnp.float32), t)


def test_data_loss_weighted_mse_semantics():
    """data_loss must equal w_sigma*mean(ds^2) + w_u*mean(sum_c du_c^2) —
    the u-term a mean over N cells (reference src/phys_cpu.cpp:140-148),
    checked against a directly computed value."""
    g = _grid()
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    params = ff.init_any(cfg, seed=1)
    tgt = _smooth_target(g)
    w = PhysWeights(w_sigma=2.0, w_u=0.5)
    got = float(ff.data_loss(g, cfg, params, tgt, w))
    out = np.asarray(sample.grid_infer_any(g, cfg, params, tgt.t))
    ds = out[..., 0] - np.asarray(tgt.sigma)
    du = np.moveaxis(out[..., 1:4], -1, 0) - np.asarray(tgt.u)
    want = 2.0 * np.mean(ds * ds) + 0.5 * np.mean(np.sum(du * du, axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_snapshots_from_model_matches_generate_fields():
    """For the MLP family the family-agnostic snapshot builder must equal
    models.fields.generate_fields exactly (same dispatch target)."""
    g = _grid()
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    params = ff.init_any(cfg, seed=2)
    a = ff.snapshots_from_model(g, cfg, params, 0.3)
    b = fields_mod.generate_fields(g, cfg, params, 0.3, g.dt)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_mlp_fit_drops_loss_and_improves_psnr():
    g = _grid()
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    tgt = _smooth_target(g)
    tc = TrainConfig(steps=150, learning_rate=3e-3, seed=0)
    params0 = ff.init_any(cfg, seed=tc.seed)
    psnr0 = float(
        ff.psnr(sample.grid_infer_any(g, cfg, params0, tgt.t)[..., 0], tgt.sigma)
    )
    params, losses = ff.fit_field(g, cfg, [tgt], tc)
    assert jnp.isfinite(losses).all()
    assert float(losses[-1]) < 0.1 * float(losses[0]), (
        float(losses[0]),
        float(losses[-1]),
    )
    rep = ff.fit_report(g, cfg, params, [tgt])
    assert rep["snapshots"][0]["psnr_sigma_db"] > psnr0 + 6.0
    assert rep["param_bytes"] > 0 and rep["raw_bytes"] == 4 * 4 * g.num_cells


def test_ngp_fit_through_same_api():
    """The hash-NGP family fits through the identical fit_field call —
    and (the NGP promise) faster per step count than the plain MLP at
    matched step budget on a detail-rich target."""
    g = _grid()
    enc = HashEncodingConfig(
        num_levels=3,
        features_per_level=2,
        log2_table_size=9,
        base_resolution=3,
        max_resolution=12,
    )
    ncfg = NGPFieldConfig(encoding=enc, hidden=16)
    tgt = _smooth_target(g)
    tc = TrainConfig(steps=120, learning_rate=1e-2, seed=3)
    params, losses = ff.fit_field(g, ncfg, [tgt], tc)
    assert jnp.isfinite(losses).all()
    assert float(losses[-1]) < 0.1 * float(losses[0])


def test_multi_snapshot_and_composite_physics_loss():
    """Two snapshots at different times + phys_weight>0: the composite
    loss is finite, trains, and actually contains the physics term
    (composite > data-only at identical params)."""
    g = _grid(nx=8, ny=6, nz=6)
    cfg = MLPGridConfig(dims=MLPDims(H=16))
    targets = [_smooth_target(g, t=0.2), _smooth_target(g, t=0.4)]
    params = ff.init_any(cfg, seed=5)
    ld = float(ff.make_fit_loss(g, cfg, targets)(params))
    lc = float(
        ff.make_fit_loss(g, cfg, targets, phys_weight=0.5)(params)
    )
    assert lc > ld  # the residual term is nonnegative and nonzero here
    tc = TrainConfig(steps=60, learning_rate=3e-3, seed=5)
    params_f, losses = ff.fit_field(
        g, cfg, targets, tc, params0=params, phys_weight=0.5
    )
    assert jnp.isfinite(losses).all()
    assert float(losses[-1]) < float(losses[0])


def test_psnr_oracle():
    ref = jnp.asarray(np.linspace(-1.0, 1.0, 64, dtype=np.float32))
    noisy = ref + 0.01
    # mse = 1e-4, peak = 2 -> psnr = 10*log10(4/1e-4) = 46.02 dB
    np.testing.assert_allclose(float(ff.psnr(noisy, ref)), 46.0206, atol=1e-3)
    assert float(ff.psnr(ref, ref)) > 200.0


def test_compression_stats_arithmetic():
    g = _grid()
    params = {"a": jnp.zeros((10, 3), jnp.float32), "b": jnp.zeros((7,), jnp.float32)}
    st = ff.compression_stats(params, g, num_snapshots=2)
    assert st["param_bytes"] == (30 + 7) * 4
    assert st["raw_bytes"] == 2 * 4 * g.num_cells * 4
    np.testing.assert_allclose(
        st["compression_ratio"], st["raw_bytes"] / st["param_bytes"]
    )


def test_fit_from_exported_npz_roundtrip(tmp_path):
    """The full loop the module exists for: simulate-ish fields -> export
    (utils/export) -> load -> fit -> serve at grid nodes."""
    g = _grid(nx=8, ny=6, nz=4)
    tgt = _smooth_target(g, t=0.25)
    p = export.save_fields_npz(
        str(tmp_path / "snap"), g, {"sigma": tgt.sigma, "u": tgt.u}, t=0.25
    )
    fields, meta = export.load_fields_npz(p)
    g2 = GridSpec(
        nx=meta["nx"], ny=meta["ny"], nz=meta["nz"],
        hx=meta["hx"], hy=meta["hy"], hz=meta["hz"],
        dt=meta["dt"], periodic=meta["periodic"], scheme=meta["scheme"],
    )
    tgt2 = ff.target_from_arrays(fields["sigma"], fields["u"], meta["t"])
    cfg = MLPGridConfig(dims=MLPDims(H=16))
    params, losses = ff.fit_field(
        g2, cfg, [tgt2], TrainConfig(steps=80, learning_rate=3e-3, seed=7)
    )
    assert float(losses[-1]) < 0.2 * float(losses[0])
    # serve the fitted field back at grid nodes: matches grid inference
    out = sample.grid_infer_any(g2, cfg, params, tgt2.t)
    assert out.shape == g2.shape + (4,)
    assert bool(jnp.isfinite(out).all())


def test_fit_respects_optimizer_chain():
    """The fit loop runs through train.loop.make_optimizer — schedules,
    optimizer choice, and clipping all apply. Two surgical probes:

    (a) schedule wiring: linear warmup starts at lr=0, so a 1-step fit
        must leave the parameters BITWISE at their init (adam update is
        exactly 0 * m_hat/...);
    (b) clip + optimizer wiring: sgd under a tiny global-norm clip bounds
        every per-step parameter movement by lr * clip (adam would
        renormalize the clipped gradient away, sgd must not)."""
    g = _grid(nx=6, ny=6, nz=4)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    tgt = _smooth_target(g)

    tc_warm = dataclasses.replace(
        TrainConfig(steps=1, learning_rate=1e-2, seed=1), warmup_steps=5
    )
    params0 = ff.init_any(cfg, seed=tc_warm.seed)
    params1, losses1 = ff.fit_field(g, cfg, [tgt], tc_warm)
    for a, b in zip(
        jax.tree_util.tree_leaves(params1),
        jax.tree_util.tree_leaves(params0),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jnp.isfinite(losses1).all()

    clip = 1e-6
    tc_clip = dataclasses.replace(
        TrainConfig(steps=10, learning_rate=1e-2, seed=1),
        optimizer="sgd",
        grad_clip=clip,
    )
    params2, _ = ff.fit_field(g, cfg, [tgt], tc_clip)
    d = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(params2),
            jax.tree_util.tree_leaves(params0),
        )
    )
    bound = tc_clip.steps * tc_clip.learning_rate * clip
    assert d <= bound * 1.01, (d, bound)
    assert d > 0.0  # the clipped run still moved (chain not a no-op)


def test_sharded_fit_step_matches_single_chip():
    """The GSPMD fit step on the 8-device mesh must track the single-chip
    fit loop: same loss sequence and parameters to fp tolerance (the
    partitioner's psum reorders the mean reduction)."""
    import dataclasses as dc

    from phys_autodiff_tpu.parallel.mesh import make_mesh

    g = _grid(nx=8, ny=8, nz=8)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    tgt = _smooth_target(g)
    tc = TrainConfig(steps=5, learning_rate=1e-3, seed=4)

    params1, losses1 = ff.fit_field(g, cfg, [tgt], tc, phys_weight=0.3)

    mesh = make_mesh(8)
    step, init = ff.make_sharded_fit_step(
        g, cfg, [tgt], mesh, tc, phys_weight=0.3
    )
    params, opt_state = init()
    losses = []
    for _ in range(tc.steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses1), rtol=1e-5
    )
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(params1),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
