"""Native C++ oracle vs NumPy oracle parity.

Both arms compute with double internals on float32 data; the residual
formula is evaluated per cell (C++) vs vectorized (NumPy), so agreement is
to f32 output rounding (near-bitwise).
"""

import numpy as np
import pytest

from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.ref import manufactured, mlp_oracle, native, oracle
from phys_autodiff_tpu.utils.config import GridSpec, MLPDims, PhysWeights
from phys_autodiff_tpu.utils.metrics import max_abs_err, rel_l2_err

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the native oracle"
)


@pytest.mark.parametrize("periodic", [True, False], ids=["periodic", "clamp"])
def test_residuals_native_vs_numpy(periodic):
    rng = np.random.default_rng(11)
    g = GridSpec(
        nx=24, ny=16, nz=12, hx=0.3, hy=0.4, hz=0.5, dt=0.01, periodic=periodic
    )
    f = {
        k: rng.standard_normal(
            ((3,) + g.shape) if k.startswith("u") else g.shape
        ).astype(np.float32)
        for k in ["sigma_tm1", "sigma_t", "sigma_tp1", "u_tm1", "u_t", "u_tp1"]
    }
    rs_c, ru_c = native.residuals(g, **f)
    rs_np, ru_np = oracle.residuals(g, **f)
    assert max_abs_err(rs_c, rs_np) <= 1e-6
    assert max_abs_err(ru_c, ru_np) <= 1e-6
    assert rel_l2_err(rs_c, rs_np) <= 1e-7


def test_manufactured_solution_native():
    g = manufactured.periodic_box_spec(nx=32, ny=32, nz=16)
    f = manufactured.solution1_fields(g, 1.2345)
    rs, ru = native.residuals(g, **f)
    expected = manufactured.solution1_expected_r_sigma(g, 1.2345)
    assert rel_l2_err(rs, expected) <= 3e-4
    assert np.max(np.abs(ru)) <= 1e-6


def test_loss_and_backward_native_vs_numpy():
    rng = np.random.default_rng(5)
    g = GridSpec(nx=16, ny=16, nz=8, hx=0.3, hy=0.3, hz=0.3, dt=0.01)
    w = PhysWeights(w_sigma=1.7, w_u=0.9)
    f = {
        k: rng.standard_normal(
            ((3,) + g.shape) if k.startswith("u") else g.shape
        ).astype(np.float32)
        for k in ["sigma_tm1", "sigma_t", "sigma_tp1", "u_tm1", "u_t", "u_tp1"]
    }
    ls_c, lu_c = native.loss_forward(g, w, **f)
    ls_np, lu_np = oracle.loss_forward(g, w, **f)
    assert abs(float(ls_c) - float(ls_np)) / abs(float(ls_np)) <= 1e-7
    assert abs(float(lu_c) - float(lu_np)) / abs(float(lu_np)) <= 1e-7

    rs, ru = oracle.residuals(g, **f)
    gs_c, gu_c = native.loss_backward(g, w, rs, ru)
    gs_np, gu_np = oracle.loss_backward(g, w, rs, ru)
    np.testing.assert_array_equal(gs_c, gs_np)
    np.testing.assert_array_equal(gu_c, gu_np)


def test_mlp_forward_native_vs_numpy():
    dims = MLPDims(In=4, H=64, Out=4)
    params = mlp.init_params(dims, seed=9, scale=0.4)
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, size=(256, 4)).astype(np.float32)
    y_c = native.mlp_forward(
        {k: np.asarray(v) for k, v in params.items()}, x
    )
    y_np = mlp_oracle.forward(mlp.to_reference_layout(params), x)
    assert rel_l2_err(y_c, y_np) <= 1e-6
