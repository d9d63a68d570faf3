"""Parity tests for the one-kernel supervised-fit step (pallas/fit.py):
loss and every parameter gradient against jax.grad of the staged XLA data
loss (train.fit_field.data_loss), interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu.pallas import fit as pfit
from phys_autodiff_tpu.train import fit_field as ff
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)


def _grid(nx=16, ny=8, nz=6):
    return GridSpec(nx=nx, ny=ny, nz=nz, hx=0.2, hy=0.2, hz=0.2, dt=1e-3)


def _target(g, seed=0):
    rng = np.random.default_rng(seed)
    sigma = rng.normal(size=g.shape).astype(np.float32)
    u = (0.5 * rng.normal(size=(3,) + g.shape)).astype(np.float32)
    return ff.FitTarget(jnp.asarray(sigma), jnp.asarray(u), 0.3)


def _xla_loss_and_grad(g, cfg, params, tgt, w):
    def loss_fn(p, tt):
        return ff.data_loss(
            g, cfg, p, ff.FitTarget(tgt.sigma, tgt.u, tt), w
        )

    (loss, grads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        params, jnp.float32(tgt.t)
    )
    return loss, grads


@pytest.mark.parametrize(
    "shape",
    [(16, 8, 6), (12, 32, 5)],  # aligned nx; unaligned nx with M % 128 == 0
    ids=["aligned", "flatM"],
)
def test_fit_kernel_matches_jax_grad(shape):
    nx, ny, nz = shape
    g = _grid(nx=nx, ny=ny, nz=nz)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    params = ff.init_any(cfg, seed=1)
    tgt = _target(g)
    w = PhysWeights(w_sigma=1.3, w_u=0.6)

    packed = pfit.pack_target(g, tgt.sigma, tgt.u)
    loss_k, (gp_k, gt_k) = pfit.fit_loss_and_grad(
        g, cfg, params, packed, tgt.t, w, interpret=True
    )
    loss_x, (gp_x, gt_x) = _xla_loss_and_grad(g, cfg, params, tgt, w)

    np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-6)
    for k in gp_x:
        np.testing.assert_allclose(
            np.asarray(gp_k[k]), np.asarray(gp_x[k]), rtol=2e-5, atol=1e-7,
            err_msg=k,
        )
    np.testing.assert_allclose(float(gt_k), float(gt_x), rtol=1e-4, atol=1e-7)


def test_fit_supported_predicate():
    assert pfit.fit_supported(_grid(nx=16, ny=8))
    assert pfit.fit_supported(_grid(nx=12, ny=32))
    assert not pfit.fit_supported(_grid(nx=10, ny=10))


def test_pack_target_layout():
    """pack_target must be the exact C-order flatten of the field layouts
    (row m of plane z is cell (y, x) with m = y*nx + x)."""
    g = _grid(nx=4, ny=2, nz=2)
    sigma = jnp.arange(g.num_cells, dtype=jnp.float32).reshape(g.shape)
    u = jnp.stack([sigma + 100, sigma + 200, sigma + 300])
    packed = pfit.pack_target(g, sigma, u)
    assert packed.shape == (g.nz, 4, g.ny * g.nx)
    np.testing.assert_array_equal(
        np.asarray(packed[1, 0]), np.asarray(sigma[1]).reshape(-1)
    )
    np.testing.assert_array_equal(
        np.asarray(packed[0, 2]), np.asarray(u[1, 0]).reshape(-1)
    )


def test_fit_field_mega_engine_matches_xla():
    """fit_field(engine="mega") must track engine="xla": same loss
    trajectory and near-identical parameters after a short run (the two
    engines differ only in reduction order)."""
    from phys_autodiff_tpu.train import TrainConfig

    g = _grid(nx=16, ny=8, nz=6)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    tgt = _target(g, seed=3)
    tc = TrainConfig(steps=8, learning_rate=1e-3, seed=2)

    px, lx = ff.fit_field(g, cfg, [tgt], tc, engine="xla")
    pm, lm = ff.fit_field(g, cfg, [tgt], tc, engine="mega", interpret=True)

    np.testing.assert_allclose(np.asarray(lm), np.asarray(lx), rtol=1e-5)
    for k in px:
        np.testing.assert_allclose(
            np.asarray(pm[k]), np.asarray(px[k]), rtol=2e-4, atol=1e-6,
            err_msg=k,
        )


def test_fit_field_mega_composite_physics():
    """The PINN composite under engine="mega" (data kernel + physics
    backward mega-kernel) matches the XLA composite."""
    from phys_autodiff_tpu.train import TrainConfig

    g = _grid(nx=16, ny=8, nz=6)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    tgt = _target(g, seed=5)
    tc = TrainConfig(steps=4, learning_rate=1e-3, seed=4)

    px, lx = ff.fit_field(g, cfg, [tgt], tc, phys_weight=0.5, engine="xla")
    pm, lm = ff.fit_field(
        g, cfg, [tgt], tc, phys_weight=0.5, engine="mega", interpret=True
    )
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lx), rtol=2e-5)
    for k in px:
        np.testing.assert_allclose(
            np.asarray(pm[k]), np.asarray(px[k]), rtol=3e-4, atol=1e-6,
            err_msg=k,
        )


def test_fit_engine_resolution():
    from phys_autodiff_tpu.train.fit_field import _resolve_fit_engine

    g_ok = _grid(nx=16, ny=8, nz=6)
    g_bad = _grid(nx=10, ny=10, nz=6)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    assert _resolve_fit_engine("mega", g_ok, cfg, 0.0) == "mega"
    with pytest.raises(ValueError, match="mega"):
        _resolve_fit_engine("mega", g_bad, cfg, 0.0)
    # auto on the CPU test backend stays on the XLA arm
    assert _resolve_fit_engine("auto", g_ok, cfg, 0.0) == "xla"
    # encoded families (out=4) route through the NGP fit kernel
    from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig
    from phys_autodiff_tpu.models.ngp import NGPFieldConfig

    ncfg = NGPFieldConfig(
        encoding=HashEncodingConfig(num_levels=2, max_resolution=8)
    )
    assert _resolve_fit_engine("mega", g_ok, ncfg, 0.0) == "mega"
    with pytest.raises(ValueError, match="mega"):
        _resolve_fit_engine("mega", g_bad, ncfg, 0.0)


def test_sharded_fit_kernel_matches_single_chip():
    """fit_loss_and_grad_sharded on the 8-device mesh must match the
    single-chip kernel at the deterministic-reduction doctrine (identical
    per-plane partials, fixed-order combination)."""
    from phys_autodiff_tpu.parallel.mesh import make_mesh

    g = _grid(nx=16, ny=8, nz=16)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    params = ff.init_any(cfg, seed=7)
    tgt = _target(g, seed=7)
    w = PhysWeights(w_sigma=1.1, w_u=0.9)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    l1, (gp1, gt1) = pfit.fit_loss_and_grad(
        g, cfg, params, packed, tgt.t, w, interpret=True
    )
    mesh = make_mesh(8)
    lag = pfit.fit_loss_and_grad_sharded(g, cfg, mesh, w, interpret=True)
    l8, (gp8, gt8) = lag(
        params, jax.device_put(packed, lag.target_sharding), tgt.t
    )
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-7)
    for k in gp1:
        np.testing.assert_allclose(
            np.asarray(gp8[k]), np.asarray(gp1[k]), rtol=1e-5, atol=1e-8,
            err_msg=k,
        )


def test_sharded_fit_step_mega_matches_xla_arm():
    """make_sharded_fit_step(engine="mega") tracks the GSPMD arm: same
    loss sequence and parameters to fp tolerance, incl. the PINN
    composite (per-shard physics mega-kernel)."""
    from phys_autodiff_tpu.parallel.mesh import make_mesh
    from phys_autodiff_tpu.train import TrainConfig

    g = _grid(nx=16, ny=8, nz=16)
    cfg = MLPGridConfig(dims=MLPDims(H=8))
    tgt = _target(g, seed=9)
    tc = TrainConfig(steps=4, learning_rate=1e-3, seed=6)
    mesh = make_mesh(8)

    losses = {}
    leaves = {}
    for eng in ("xla", "mega"):
        step, init = ff.make_sharded_fit_step(
            g, cfg, [tgt], mesh, tc, phys_weight=0.3, engine=eng,
            interpret=True,
        )
        params, opt_state = init()
        ls = []
        for _ in range(tc.steps):
            params, opt_state, loss = step(params, opt_state)
            ls.append(float(loss))
        losses[eng] = ls
        leaves[eng] = jax.tree_util.tree_leaves(params)

    np.testing.assert_allclose(
        np.asarray(losses["mega"]), np.asarray(losses["xla"]), rtol=1e-5
    )
    for a, b in zip(leaves["mega"], leaves["xla"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6
        )


def _ngp_cfg(small=True):
    from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig
    from phys_autodiff_tpu.models.ngp import NGPFieldConfig

    enc = HashEncodingConfig(
        num_levels=3,
        features_per_level=2,
        log2_table_size=9,
        base_resolution=3,
        max_resolution=12,
    )
    return NGPFieldConfig(encoding=enc, hidden=16)


def test_ngp_fit_kernel_matches_jax_grad():
    """The NGP fused fit step: loss + head grads + encoder-table grads
    against jax.grad of the staged data loss (hash family, dEnc path)."""
    g = _grid(nx=16, ny=8, nz=6)
    ncfg = _ngp_cfg()
    params = ff.init_any(ncfg, seed=2)
    tgt = _target(g, seed=4)
    w = PhysWeights(w_sigma=1.2, w_u=0.8)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    loss_k, (gp_k, gt_k) = pfit.ngp_fit_loss_and_grad(
        g, ncfg, params, packed, tgt.t, w, interpret=True
    )
    loss_x, gp_x = jax.value_and_grad(
        lambda p: ff.data_loss(g, ncfg, p, tgt, w)
    )(params)

    np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-6)
    flat_k, _ = jax.flatten_util.ravel_pytree(gp_k)
    flat_x, _ = jax.flatten_util.ravel_pytree(gp_x)
    err = float(
        jnp.linalg.norm(flat_k - flat_x) / (jnp.linalg.norm(flat_x) + 1e-30)
    )
    assert err < 2e-5, err


def test_fourier_fit_kernel_matches_jax_grad():
    """Parameter-free encoding (Fourier): the kernel drops dEnc entirely
    (need_denc=False) and must still match jax.grad."""
    from phys_autodiff_tpu.models.fourier import FourierEncodingConfig
    from phys_autodiff_tpu.models.ngp import NGPFieldConfig

    g = _grid(nx=16, ny=8, nz=5)
    ncfg = NGPFieldConfig(
        encoding=FourierEncodingConfig(num_frequencies=3), hidden=16
    )
    params = ff.init_any(ncfg, seed=3)
    tgt = _target(g, seed=6)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    loss_k, (gp_k, _) = pfit.ngp_fit_loss_and_grad(
        g, ncfg, params, packed, tgt.t, interpret=True
    )
    loss_x, gp_x = jax.value_and_grad(
        lambda p: ff.data_loss(g, ncfg, p, tgt)
    )(params)
    np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-6)
    flat_k, _ = jax.flatten_util.ravel_pytree(gp_k)
    flat_x, _ = jax.flatten_util.ravel_pytree(gp_x)
    err = float(
        jnp.linalg.norm(flat_k - flat_x) / (jnp.linalg.norm(flat_x) + 1e-30)
    )
    assert err < 2e-5, err


def test_fit_field_mega_engine_ngp():
    """fit_field(engine="mega") for the hash-NGP family tracks the XLA
    engine, incl. the PINN composite (physics via the NGP mega-kernel)."""
    from phys_autodiff_tpu.train import TrainConfig

    g = _grid(nx=16, ny=8, nz=6)
    ncfg = _ngp_cfg()
    tgt = _target(g, seed=8)
    tc = TrainConfig(steps=4, learning_rate=3e-3, seed=5)

    px, lx = ff.fit_field(g, ncfg, [tgt], tc, phys_weight=0.2, engine="xla")
    pm, lm = ff.fit_field(
        g, ncfg, [tgt], tc, phys_weight=0.2, engine="mega", interpret=True
    )
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lx), rtol=2e-5)
    fx, _ = jax.flatten_util.ravel_pytree(px)
    fm, _ = jax.flatten_util.ravel_pytree(pm)
    err = float(
        jnp.linalg.norm(fm - fx) / (jnp.linalg.norm(fx) + 1e-30)
    )
    assert err < 3e-4, err


def test_sharded_ngp_fit_kernel_matches_single_chip():
    """ngp_fit_loss_and_grad_sharded on the 8-device mesh: shard-local
    encode + per-shard kernel + psum'd table pullback must match the
    single-chip NGP fit kernel."""
    from phys_autodiff_tpu.parallel.mesh import make_mesh

    g = _grid(nx=16, ny=8, nz=16)
    ncfg = _ngp_cfg()
    params = ff.init_any(ncfg, seed=11)
    tgt = _target(g, seed=11)
    w = PhysWeights(w_sigma=1.05, w_u=0.95)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    l1, (gp1, gt1) = pfit.ngp_fit_loss_and_grad(
        g, ncfg, params, packed, tgt.t, w, interpret=True
    )
    mesh = make_mesh(8)
    lag = pfit.ngp_fit_loss_and_grad_sharded(g, ncfg, mesh, w, interpret=True)
    l8, (gp8, gt8) = lag(
        params, jax.device_put(packed, lag.target_sharding), tgt.t
    )
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-7)
    f1, _ = jax.flatten_util.ravel_pytree(gp1)
    f8, _ = jax.flatten_util.ravel_pytree(gp8)
    err = float(
        jnp.linalg.norm(f8 - f1) / (jnp.linalg.norm(f1) + 1e-30)
    )
    assert err < 1e-5, err
    np.testing.assert_allclose(float(gt8), float(gt1), rtol=1e-5, atol=1e-9)


def test_sharded_fit_step_mega_ngp_matches_xla_arm():
    """make_sharded_fit_step(engine="mega") for the hash-NGP family tracks
    the GSPMD arm, incl. the PINN composite via the sharded NGP physics
    mega-kernel."""
    from phys_autodiff_tpu.parallel.mesh import make_mesh
    from phys_autodiff_tpu.train import TrainConfig

    g = _grid(nx=16, ny=8, nz=16)
    ncfg = _ngp_cfg()
    tgt = _target(g, seed=13)
    tc = TrainConfig(steps=3, learning_rate=3e-3, seed=8)
    mesh = make_mesh(8)

    losses = {}
    flats = {}
    for eng in ("xla", "mega"):
        step, init = ff.make_sharded_fit_step(
            g, ncfg, [tgt], mesh, tc, phys_weight=0.2, engine=eng,
            interpret=True,
        )
        params, opt_state = init()
        ls = []
        for _ in range(tc.steps):
            params, opt_state, loss = step(params, opt_state)
            ls.append(float(loss))
        losses[eng] = ls
        flats[eng], _ = jax.flatten_util.ravel_pytree(params)

    np.testing.assert_allclose(
        np.asarray(losses["mega"]), np.asarray(losses["xla"]), rtol=2e-5
    )
    err = float(
        jnp.linalg.norm(flats["mega"] - flats["xla"])
        / (jnp.linalg.norm(flats["xla"]) + 1e-30)
    )
    assert err < 3e-4, err


@pytest.mark.parametrize(
    "enc_kwargs",
    [
        # mixed: dense top levels + hashed low levels (the fit_ladder.py
        # dense rows' structure: T=64, resolutions 3/5/8 -> levels 5,8 dense)
        dict(num_levels=3, log2_table_size=6, base_resolution=3,
             max_resolution=8, dense_oversubscribed=True),
        # all-hash with an oversubscribed top level (the ladder's literal
        # Instant-NGP rows: the table backward is the corner scatter-add)
        dict(num_levels=3, log2_table_size=6, base_resolution=3,
             max_resolution=8, dense_oversubscribed=False),
    ],
    ids=["dense_mixed", "all_hash_oversub"],
)
def test_ngp_fit_kernel_ladder_configs(enc_kwargs):
    """Every scripts/fit_ladder.py schedule shape (dense+hash mix and
    oversubscribed all-hash) runs through the fused fit engine and matches
    jax.grad — the CPU gate for the hardware compression sweep."""
    from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig
    from phys_autodiff_tpu.models.ngp import NGPFieldConfig

    g = _grid(nx=16, ny=8, nz=6)
    ncfg = NGPFieldConfig(
        encoding=HashEncodingConfig(**enc_kwargs), hidden=16
    )
    assert bool(ncfg.encoding.dense_levels()) == enc_kwargs[
        "dense_oversubscribed"
    ]
    params = ff.init_any(ncfg, seed=5)
    tgt = _target(g, seed=6)
    w = PhysWeights(w_sigma=1.1, w_u=0.7)
    packed = pfit.pack_target(g, tgt.sigma, tgt.u)

    loss_k, (gp_k, _) = pfit.ngp_fit_loss_and_grad(
        g, ncfg, params, packed, tgt.t, w, interpret=True
    )
    loss_x, gp_x = jax.value_and_grad(
        lambda p: ff.data_loss(g, ncfg, p, tgt, w)
    )(params)

    np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-6)
    flat_k, _ = jax.flatten_util.ravel_pytree(gp_k)
    flat_x, _ = jax.flatten_util.ravel_pytree(gp_x)
    err = float(
        jnp.linalg.norm(flat_k - flat_x) / (jnp.linalg.norm(flat_x) + 1e-30)
    )
    assert err < 2e-5, err
