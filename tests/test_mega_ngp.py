"""The NGP backward mega-kernel (pallas/mega_ngp.py): loss + all gradients
for the hash-encoded field model in one kernel pass, vs jax.value_and_grad
through the staged XLA pipeline. Framework extension — the reference has
neither a hash encoding nor training (SURVEY.md §0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import ngp
from phys_autodiff_tpu.models.hash_encoder import (
    HashEncodingConfig,
    encode_grid,
    encode_grid_zcf,
)
from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad
from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights

# dense + hash level mix: r = 4 (125 <= 128 -> hashed), 6 and 8 (dense)
ENC = HashEncodingConfig(
    num_levels=3, base_resolution=4, max_resolution=8, log2_table_size=7,
    dense_oversubscribed=True,
)


def _setup(nx=128, ny=8, nz=6, periodic=True, scheme="central", hidden=16):
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.3, hy=0.3, hz=0.3, dt=1e-2,
                 periodic=periodic, scheme=scheme)
    ncfg = ngp.NGPFieldConfig(encoding=ENC, hidden=hidden)
    params = ngp.init_ngp_params(ncfg, seed=7)
    # Condition the test: the paper-init tables (1e-4) and zero biases leave
    # every gradient at the f32 noise floor, where a relative comparison is
    # meaningless. Scale tables to O(1) features and randomize the biases so
    # each leaf's gradient is solidly nonzero.
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
    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    return g, w, ncfg, params


def _staged_total(g, w, ncfg, params, t):
    fs = ngp.generate_fields(g, ncfg, params, t, g.dt)
    ls, lu = ops.loss_forward(g, w, fs)
    return ls + lu


def _leaf_close(a, b, tol):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) <= tol * max(np.linalg.norm(a), 1e-30)


def test_encode_grid_zcf_matches_encode_grid():
    g, w, ncfg, params = _setup()
    ref = encode_grid(ncfg.encoding, params["tables"], g)  # [nz,ny,nx,LF]
    out = encode_grid_zcf(ncfg.encoding, params["tables"], g)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(jnp.moveaxis(ref, -1, 1)),
        rtol=2e-6, atol=1e-6,
    )


def test_encode_grid_zcf_rows_bit_identical():
    """The shard-local row-subset encoder must reproduce the matching full
    rows EXACTLY (same static weights, same contraction per row) — wrapped,
    clamped-duplicate, and interior rows alike."""
    from phys_autodiff_tpu.models.hash_encoder import encode_grid_zcf_rows

    g, w, ncfg, params = _setup(nz=8)
    full = np.asarray(encode_grid_zcf(ncfg.encoding, params["tables"], g))
    rows = jnp.asarray([6, 7, 0, 1, 2, 3, 0, 0], jnp.int32)  # wrap + dupes
    sub = np.asarray(
        encode_grid_zcf_rows(ncfg.encoding, params["tables"], g, rows)
    )
    np.testing.assert_array_equal(sub, full[np.asarray(rows)])


@pytest.mark.parametrize("variant", ["fused", "base", "fused2"])
@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
@pytest.mark.parametrize("scheme", ["central", "upwind"])
def test_ngp_mega_matches_staged_grad(periodic, scheme, variant, monkeypatch):
    from phys_autodiff_tpu.pallas import mega_ngp

    monkeypatch.setattr(mega_ngp, "_HEAD_VARIANT", variant)
    g, w, ncfg, params = _setup(periodic=periodic, scheme=scheme)
    t = jnp.float32(0.3)
    loss_ref, (g_ref, gt_ref) = jax.value_and_grad(
        lambda p, tt: _staged_total(g, w, ncfg, p, tt), argnums=(0, 1)
    )(params, t)
    loss, (grads, d_t) = ngp_loss_and_grad(g, w, ncfg, params, t,
                                           interpret=True)
    assert abs(float(loss) - float(loss_ref)) <= 1e-5 * abs(float(loss_ref))
    tol = 1e-4 if periodic else 5e-3  # clamp: ill-conditioned (see tpu_parity)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(grads)
    )
    for k, v_ref in flat_ref:
        key = jax.tree_util.keystr(k)
        assert _leaf_close(v_ref, flat_out[key], tol), (
            key,
            float(jnp.linalg.norm(v_ref)),
            float(jnp.linalg.norm(flat_out[key])),
        )
    assert abs(float(d_t) - float(gt_ref)) <= max(
        5e-3 * abs(float(gt_ref)), 1e-6
    )


def test_ngp_fastbwd_tier_class():
    """The opt-in f32_fastbwd tier (round-5, VERDICT #4 experiment shipped):
    exact f32 forward — the LOSS must match the f32 kernel to f32 rounding —
    with bf16 carried backward windows, whose gradients sit in a ~2.3e-2
    class (measured on hardware): strictly tighter than the bf16 tier's,
    strictly looser than the f32 tier's."""
    g, w, ncfg, params = _setup()
    t = jnp.float32(0.3)
    loss_ref, (g_ref, _) = jax.value_and_grad(
        lambda p, tt: _staged_total(g, w, ncfg, p, tt), argnums=(0, 1)
    )(params, t)
    loss, (grads, _) = ngp_loss_and_grad(
        g, w, ncfg, params, t, precision="f32_fastbwd", interpret=True
    )
    # forward is untouched: f32-class loss agreement
    assert abs(float(loss) - float(loss_ref)) <= 1e-5 * abs(float(loss_ref))
    cat = lambda gp: np.concatenate(
        [np.asarray(x, np.float64).ravel()
         for x in jax.tree_util.tree_leaves(gp)]
    )
    rel = np.linalg.norm(cat(grads) - cat(g_ref)) / np.linalg.norm(cat(g_ref))
    # documented tier class: reduced-precision backward, ~2.3e-2 measured
    assert rel <= 5e-2, rel
    # and the windows really are reduced precision: tighter than f32 would
    # be suspicious only if bf16 rounding vanished — just require nonzero
    # gradients everywhere (sanity)
    assert np.all(np.isfinite(cat(grads)))


def test_ngp_mega_flat_layout():
    """Unaligned nx runs the FLAT plane layout via the shared _PlaneOps."""
    g, w, ncfg, params = _setup(nx=64, ny=16, nz=6)
    t = jnp.float32(0.3)
    loss_ref, g_ref = jax.value_and_grad(
        lambda p: _staged_total(g, w, ncfg, p, t)
    )(params)
    loss, (grads, _) = ngp_loss_and_grad(g, w, ncfg, params, t,
                                         interpret=True)
    assert abs(float(loss) - float(loss_ref)) <= 1e-5 * abs(float(loss_ref))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(grads),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        assert _leaf_close(a, b, 1e-4), jax.tree_util.keystr(ka)


def test_ngp_train_step_mega_matches_xla():
    """One optimizer step through the NGP mega backward equals the XLA-arm
    step within f32 agreement (the same contract the coordinate-MLP fused
    step satisfies, tests/test_train.py)."""
    from phys_autodiff_tpu.train import loop as train_loop

    g, w, ncfg, params = _setup()
    cfg = train_loop.TrainConfig(t_sampling="fixed", learning_rate=1e-3)
    step_m, st_m = train_loop.make_ngp_train_step(
        g, w, ncfg, cfg, params, backward="mega"
    )
    step_x, st_x = train_loop.make_ngp_train_step(
        g, w, ncfg, cfg, params, backward="xla"
    )
    st_m, l_m = step_m(st_m)
    st_x, l_x = step_x(st_x)
    assert abs(float(l_m) - float(l_x)) <= 1e-5 * abs(float(l_x))
    for a, b in zip(jax.tree_util.tree_leaves(st_m.params),
                    jax.tree_util.tree_leaves(st_x.params)):
        assert _leaf_close(a, b, 1e-4)


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_ngp_mega_sharded_matches_single(periodic):
    """The per-shard NGP backward mega-kernel under shard_map (z-axis
    spatial decomposition, pre-extended encoding halos, psum'd parameter
    gradients, fixed-order gathered loss) matches the single-chip kernel
    on the 8-device CPU mesh."""
    from phys_autodiff_tpu.parallel.mesh import make_mesh
    from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad_sharded

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    g, w, ncfg, params = _setup(nz=16, periodic=periodic)
    t = jnp.float32(0.3)
    l1, (g1, dt1) = ngp_loss_and_grad(g, w, ncfg, params, t, interpret=True)
    fn = ngp_loss_and_grad_sharded(g, w, ncfg, mesh, interpret=True)
    ln, (gn, dtn) = fn(params, t)
    assert abs(float(ln) - float(l1)) <= 5e-6 * abs(float(l1))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(gn),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        # raw-gradient comparison: the per-shard psum reassociates the f32
        # accumulator sums (the LOSS stays 1e-7-deterministic via the
        # fixed-order gathered partials; gradients are f32-noise class)
        assert _leaf_close(a, b, 1e-5), jax.tree_util.keystr(ka)
    assert abs(float(dtn) - float(dt1)) <= max(
        1e-5 * abs(float(dt1)), 1e-7
    )


def test_ngp_mega_fallback_unsupported_plane():
    """ny*nx % 128 != 0 falls back to jax.grad through the staged path."""
    g, w, ncfg, params = _setup(nx=12, ny=9, nz=6)
    t = jnp.float32(0.3)
    loss_ref, g_ref = jax.value_and_grad(
        lambda p: _staged_total(g, w, ncfg, p, t)
    )(params)
    loss, (grads, _) = ngp_loss_and_grad(g, w, ncfg, params, t,
                                         interpret=True)
    assert abs(float(loss) - float(loss_ref)) <= 1e-6 * abs(float(loss_ref))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(grads)):
        assert _leaf_close(a, b, 1e-6)


def test_ngp_mode_table_policy():
    """Round-4 hardware A/B shipped a per-kernel mode table: the NGP
    kernels run fwd/dw2 on the MXU and da1 on the VPU for the f32 tiers
    (8.28 -> 6.67 ms kernel-only at the flagship), while the
    coordinate-MLP kernels keep their own measured optimum. Pin the
    policy so a refactor can't silently re-unify them."""
    from phys_autodiff_tpu.pallas.mega_bwd import _resolve_mode
    from phys_autodiff_tpu.pallas.mega_ngp import (
        _resolve_head_variant,
        _resolve_ngp_mode,
    )

    for prec in ("f32", "f32_high"):
        assert _resolve_ngp_mode("fwd", prec) == "dot"
        assert _resolve_ngp_mode("dw2", prec) == "dot"
        assert _resolve_ngp_mode("da1", prec) == "vpu"
        # the coordinate-MLP kernel's table is unchanged (all-VPU f32)
        assert _resolve_mode("fwd", prec) == "vpu"
        assert _resolve_mode("dw2", prec) == "vpu"
    for which in ("fwd", "dw2", "da1"):
        assert _resolve_ngp_mode(which, "bf16") == "dot"
    assert _resolve_head_variant() == "fused2"
