"""MLP parity tests.

Ports of test/test_mlp_grid_infer.cpp (inference parity, rel_l2 <= 1e-6),
test/test_mlp_compare.cpp (gradient parity — here with real thresholds, the
reference only printed diffs), and test/test_mlp_phys_integration_inputs.cpp
(shape + NaN/Inf validation of the MLP -> physics handoff).
"""

import jax
import jax.numpy as jnp
import numpy as np

from phys_autodiff_tpu.models import fields as fields_mod
from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.models.coords import grid_coords
from phys_autodiff_tpu.ref import mlp_oracle
from phys_autodiff_tpu.utils import tolerances as tol
from phys_autodiff_tpu.utils.config import (
    CoordNorm,
    GridSpec,
    MLPDims,
    MLPGridConfig,
)
from phys_autodiff_tpu.utils.metrics import max_abs_err, rel_l2_err


def test_layout_roundtrip():
    dims = MLPDims(In=4, H=16, Out=4)
    params = mlp.init_params(dims, seed=5, scale=0.3)
    ref = mlp.to_reference_layout(params)
    back = mlp.from_reference_layout(ref)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(back[k]))
    assert ref["W1"].shape == (16, 4)
    assert ref["W2"].shape == (4, 16)


def test_forward_parity_vs_numpy_reference():
    dims = MLPDims(In=4, H=64, Out=4)
    params = mlp.init_params(dims, seed=123, scale=0.25)
    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, size=(512, 4)).astype(np.float32)
    y_ref = mlp_oracle.forward(mlp.to_reference_layout(params), x)
    y = jax.jit(mlp.forward)(params, jnp.asarray(x))
    assert rel_l2_err(y, y_ref) <= tol.MLP_INFER_REL


def test_grid_infer_parity():
    """Port of test/test_mlp_grid_infer.cpp: 32x32x24 grid, H=64, seed 123,
    scale 0.25, t=0.3, non-periodic."""
    g = GridSpec(nx=32, ny=32, nz=24, dt=1e-3, periodic=False)
    cfg = MLPGridConfig(dims=MLPDims(In=4, H=64, Out=4))
    params = mlp.init_params(cfg.dims, seed=123, scale=0.25)

    # oracle arm: host coords + numpy MLP
    coords = np.asarray(grid_coords(g, 0.3, cfg.norm)).reshape(-1, 4)
    y_ref = mlp_oracle.forward(mlp.to_reference_layout(params), coords)

    y = jax.jit(lambda p: fields_mod.grid_infer(g, cfg, p, 0.3))(params)
    assert rel_l2_err(np.asarray(y).reshape(-1, 4), y_ref) <= tol.MLP_INFER_REL


def test_mse_gradients_parity():
    """Port of test/test_mlp_compare.cpp (B=512, In=256, H=512, Out=256) with
    actual thresholds: jax.grad vs the hand-derived reference gradients."""
    dims = MLPDims(In=256, H=512, Out=256)
    params = mlp.init_params(dims, seed=7, scale=0.1)
    rng = np.random.default_rng(31)
    x = rng.uniform(-1, 1, size=(512, dims.In)).astype(np.float32)
    y_t = rng.uniform(-1, 1, size=(512, dims.Out)).astype(np.float32)

    ref_grads = mlp_oracle.mse_backward(
        mlp.to_reference_layout(params), x, y_t
    )
    grads = jax.jit(mlp.mse_grads)(params, jnp.asarray(x), jnp.asarray(y_t))
    grads_ref_layout = mlp.to_reference_layout(grads)
    for k in ["W1", "b1", "W2", "b2"]:
        assert rel_l2_err(grads_ref_layout[k], ref_grads[k]) <= 1e-5, k


def test_generate_fields_shapes_and_finiteness():
    """Port of test/test_mlp_phys_integration_inputs.cpp: 48x48x32, seed 321,
    t=0.25, dt=2e-3 — shape checks + NaN/Inf scan (:20-27)."""
    g = GridSpec(nx=48, ny=48, nz=32, dt=2e-3)
    cfg = MLPGridConfig()
    params = mlp.init_params(cfg.dims, seed=321, scale=0.5)
    fs = jax.jit(lambda p: fields_mod.generate_fields(g, cfg, p, 0.25, g.dt))(params)

    assert fs.sigma_tm1.shape == g.shape
    assert fs.sigma_t.shape == g.shape
    assert fs.sigma_tp1.shape == g.shape
    for u in (fs.u_tm1, fs.u_t, fs.u_tp1):
        assert u.shape == (3,) + g.shape
    for arr in fs:
        assert bool(jnp.all(jnp.isfinite(arr)))


def test_generate_fields_matches_three_separate_inferences():
    """The batched 3-slice evaluation must equal three separate grid_infer
    calls (the reference structure, src/mlp_grid.cpp:100-102)."""
    g = GridSpec(nx=12, ny=10, nz=8, dt=2e-3)
    for norm in (CoordNorm.MinusOneToOne, CoordNorm.ZeroToOne):
        cfg = MLPGridConfig(norm=norm)
        params = mlp.init_params(cfg.dims, seed=11, scale=0.5)
        t = 0.25
        fs = jax.jit(lambda p: fields_mod.generate_fields(g, cfg, p, t, g.dt))(params)
        for tt, sig, u in [
            (t - g.dt, fs.sigma_tm1, fs.u_tm1),
            (t, fs.sigma_t, fs.u_t),
            (t + g.dt, fs.sigma_tp1, fs.u_tp1),
        ]:
            y = fields_mod.grid_infer(g, cfg, params, tt)
            sig2, u2 = fields_mod.split_channels(y)
            assert max_abs_err(sig, sig2) <= 1e-6
            assert max_abs_err(u, u2) <= 1e-6


def test_coord_time_quirk():
    """ZeroToOne adds +0.5 to the time channel (src/mlp_grid.cpp:38)."""
    g = GridSpec(nx=4, ny=4, nz=4)
    c_mm = np.asarray(grid_coords(g, 0.25, CoordNorm.MinusOneToOne))
    c_01 = np.asarray(grid_coords(g, 0.25, CoordNorm.ZeroToOne))
    assert np.all(c_mm[..., 3] == np.float32(0.25))
    assert np.all(c_01[..., 3] == np.float32(0.75))
    # spatial normalization
    assert c_mm[0, 0, 0, 0] == -1.0 and c_mm[0, 0, 3, 0] == 1.0
    assert c_01[0, 0, 0, 0] == 0.0 and c_01[0, 0, 3, 0] == 1.0
