"""The encoder REGISTRY contract (models/encoders.py): third-party encoder
families plug in via register_family and every downstream consumer — the
decode head, the one-kernel training step, the sharded per-shard kernel —
serves them unchanged. Pinned by registering a toy PARAMETERIZED family
(learned per-channel gains over Fourier features) and checking the
mega-kernel gradients, including the dEnc pullback through the custom
encode_grid_zcf, against jax.grad. No reference analogue (the reference
has exactly one model family, SURVEY.md §0)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import encoders, fourier, ngp
from phys_autodiff_tpu.models.encoders import EncoderFamily, register_family
from phys_autodiff_tpu.models.fourier import FourierEncodingConfig
from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad
from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights


@dataclasses.dataclass(frozen=True)
class GainedFourierConfig:
    """Toy third family: Fourier features with a LEARNED per-channel gain —
    the smallest encoder with parameters that is not a built-in, so its
    gradient must flow through the registry's encode_grid_zcf pullback."""

    base: FourierEncodingConfig = FourierEncodingConfig(num_frequencies=2)

    @property
    def out_dim(self) -> int:
        return self.base.out_dim


def _gf_init(cfg, seed):
    rng = np.random.Generator(np.random.MT19937(seed + 11))
    return jnp.asarray(
        1.0 + 0.2 * rng.standard_normal(cfg.out_dim), jnp.float32
    )


register_family(
    GainedFourierConfig,
    EncoderFamily(
        name="gained_fourier",
        init_params=_gf_init,
        schedule_meta=lambda cfg: {
            "toy_gained_fourier_k": cfg.base.num_frequencies
        },
        encode=lambda cfg, p, coords, allow_large: (
            fourier.encode(cfg.base, coords) * p
        ),
        encode_grid=lambda cfg, p, g: fourier.encode_grid(cfg.base, g) * p,
        encode_grid_zcf=lambda cfg, p, g: (
            fourier.encode_grid_zcf(cfg.base, g) * p[None, :, None, None]
        ),
        encode_grid_zcf_rows=lambda cfg, p, g, rows: (
            fourier.encode_grid_zcf_rows(cfg.base, g, rows)
            * p[None, :, None, None]
        ),
    ),
)

ENC = GainedFourierConfig()


def _setup(nx=128, ny=8, nz=6, periodic=True, scheme="central"):
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.3, hy=0.3, hz=0.3, dt=1e-2,
                 periodic=periodic, scheme=scheme)
    ncfg = ngp.NGPFieldConfig(encoding=ENC, hidden=16)
    params = ngp.init_ngp_params(ncfg, seed=7)
    rng = np.random.Generator(np.random.MT19937(21))
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


def test_registry_contract():
    """Registration guards: conflicting re-registration, missing out_dim,
    unknown config type; same-name re-registration is idempotent."""
    fam = encoders.family_of(ENC)
    assert fam.name == "gained_fourier"
    register_family(GainedFourierConfig, fam)  # idempotent
    with pytest.raises(ValueError):
        register_family(
            GainedFourierConfig, dataclasses.replace(fam, name="other")
        )

    class NoOutDim:
        pass

    with pytest.raises(TypeError):
        register_family(NoOutDim, fam)
    with pytest.raises(TypeError):
        encoders.family_of(object())
    with pytest.raises(TypeError):
        register_family("not-a-type", fam)


def test_dispatch_routes_toy_family():
    g, _, _, _ = _setup(nx=12, ny=7, nz=5)
    p = encoders.init_params(ENC, seed=3)
    assert p.shape == (ENC.out_dim,)
    grid = np.asarray(encoders.encode_grid(ENC, p, g))
    ref = np.asarray(fourier.encode_grid(ENC.base, g)) * np.asarray(p)
    np.testing.assert_array_equal(grid, ref)
    zcf = np.asarray(encoders.encode_grid_zcf(ENC, p, g))
    np.testing.assert_array_equal(zcf, np.moveaxis(grid, -1, 1))
    rows = jnp.asarray([4, 0, 1, 0], jnp.int32)
    sub = np.asarray(encoders.encode_grid_zcf_rows(ENC, p, g, rows))
    np.testing.assert_array_equal(sub, zcf[np.asarray(rows)])
    meta = encoders.schedule_meta(ENC)
    assert meta == {"toy_gained_fourier_k": 2}
    assert meta != encoders.schedule_meta(ENC.base)


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_toy_family_mega_matches_staged_grad(periodic):
    """The one-kernel backward serves a REGISTERED family: loss + head grads
    + the encoder-parameter gradient (via the registry encode_grid_zcf
    pullback) vs jax.grad through the staged pipeline."""
    g, w, ncfg, params = _setup(periodic=periodic)
    t = jnp.float32(0.3)
    loss_ref, g_ref = jax.value_and_grad(
        lambda p: _staged_total(g, w, ncfg, p, t)
    )(params)
    loss, (grads, _) = ngp_loss_and_grad(g, w, ncfg, params, t,
                                         interpret=True)
    assert abs(float(loss) - float(loss_ref)) <= 1e-5 * abs(float(loss_ref))
    assert float(jnp.sum(jnp.abs(grads["tables"]))) > 0.0
    tol = 1e-4 if periodic else 5e-3
    for k in ("tables", "W1", "b1", "W2", "b2"):
        assert _leaf_close(g_ref[k], grads[k], tol), k


def test_fast_encode_dispatch():
    """The fast-encode registry surface: families WITHOUT a fast variant
    fall back to the exact encode bit-for-bit; families WITH one route
    fast=True there (pinned with a marker impl); the built-in hash family
    registers fast variants that keep shapes/values within the bf16-tier
    doctrine (on this CPU backend DEFAULT == HIGHEST, so exact equality —
    the precision split is a TPU-only effect checked by the hardware
    parity sweep, scripts/tpu_parity.py)."""
    g, _, _, _ = _setup(nx=12, ny=7, nz=5)

    # 1) no-fast family: fallback is the exact callable
    p = encoders.init_params(ENC, seed=3)
    exact = np.asarray(encoders.encode_grid_zcf(ENC, p, g))
    fast = np.asarray(encoders.encode_grid_zcf(ENC, p, g, fast=True))
    np.testing.assert_array_equal(exact, fast)
    rows = jnp.asarray([2, 0, 4], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(encoders.encode_grid_zcf_rows(ENC, p, g, rows)),
        np.asarray(encoders.encode_grid_zcf_rows(ENC, p, g, rows, fast=True)),
    )

    # 2) fast routing is actually taken when registered
    @dataclasses.dataclass(frozen=True)
    class MarkedConfig:
        base: FourierEncodingConfig = FourierEncodingConfig(num_frequencies=1)

        @property
        def out_dim(self) -> int:
            return self.base.out_dim

    base_fam = encoders.family_of(ENC)
    register_family(
        MarkedConfig,
        dataclasses.replace(
            base_fam,
            name="marked",
            encode_grid_zcf_fast=lambda cfg, p, g: (
                2.0 * base_fam.encode_grid_zcf(cfg, p, g)
            ),
            encode_grid_zcf_rows_fast=lambda cfg, p, g, rows: (
                2.0 * base_fam.encode_grid_zcf_rows(cfg, p, g, rows)
            ),
        ),
    )
    mc = MarkedConfig()
    pm = encoders.init_params(mc, seed=0)
    e = np.asarray(encoders.encode_grid_zcf(mc, pm, g))
    f = np.asarray(encoders.encode_grid_zcf(mc, pm, g, fast=True))
    np.testing.assert_allclose(f, 2.0 * e, rtol=1e-6)
    er = np.asarray(encoders.encode_grid_zcf_rows(mc, pm, g, rows))
    fr = np.asarray(encoders.encode_grid_zcf_rows(mc, pm, g, rows, fast=True))
    np.testing.assert_allclose(fr, 2.0 * er, rtol=1e-6)

    # 3) hash family: fast variants registered, shape-identical, exact on CPU
    from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig

    hcfg = HashEncodingConfig(
        num_levels=3, base_resolution=3, max_resolution=10,
        log2_table_size=5, dense_oversubscribed=True,
    )
    assert hcfg.dense_levels(), "config must exercise the dense matmul path"
    ht = encoders.init_params(hcfg, seed=1)
    he = np.asarray(encoders.encode_grid_zcf(hcfg, ht, g))
    hf = np.asarray(encoders.encode_grid_zcf(hcfg, ht, g, fast=True))
    assert he.shape == hf.shape
    np.testing.assert_allclose(hf, he, rtol=1e-6, atol=1e-7)
    hr = np.asarray(encoders.encode_grid_zcf_rows(hcfg, ht, g, rows, fast=True))
    np.testing.assert_allclose(hr, hf[np.asarray(rows)], rtol=1e-6, atol=1e-7)


def test_toy_family_sharded_matches_single():
    """The sharded per-shard kernel serves the registered family: the
    shard-local encode_grid_zcf_rows + psum'd encoder-gradient pullback
    matches single-chip."""
    from phys_autodiff_tpu.parallel.mesh import make_mesh
    from phys_autodiff_tpu.pallas.mega_ngp import ngp_loss_and_grad_sharded

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    g, w, ncfg, params = _setup(nz=16)
    t = jnp.float32(0.3)
    l1, (g1, dt1) = ngp_loss_and_grad(g, w, ncfg, params, t, interpret=True)
    fn = ngp_loss_and_grad_sharded(g, w, ncfg, mesh, interpret=True)
    ln, (gn, dtn) = fn(params, t)
    assert abs(float(ln) - float(l1)) <= 5e-6 * abs(float(l1))
    for k in ("tables", "W1", "b1", "W2", "b2"):
        assert _leaf_close(g1[k], gn[k], 1e-5), k
    assert abs(float(dtn) - float(dt1)) <= max(1e-5 * abs(float(dt1)), 1e-7)
