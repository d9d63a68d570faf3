"""Utility-layer tests: layout bijection, numerical guards, configs."""

import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu.utils import checks, layout
from phys_autodiff_tpu.utils.config import GridSpec


def test_layout_bijection_matches_reference_indexing():
    """field.reshape(-1)[ (z*ny+y)*nx + x ] == field[z,y,x] — the exact
    reference flat layout (src/phys_cpu.cpp:17-19)."""
    g = GridSpec(nx=5, ny=4, nz=3)
    f = np.arange(g.num_cells, dtype=np.float32).reshape(g.shape)
    flat = layout.scalar_to_flat(f)
    for z, y, x in [(0, 0, 0), (2, 3, 4), (1, 2, 3)]:
        assert flat[(z * g.ny + y) * g.nx + x] == f[z, y, x]
    np.testing.assert_array_equal(layout.scalar_from_flat(flat, g), f)

    u = np.arange(3 * g.num_cells, dtype=np.float32).reshape((3,) + g.shape)
    uflat = layout.vector_to_flat(u)
    # channel-major: [ux(0..N-1), uy, uz] (include/phys.h:20)
    assert uflat[0] == u[0, 0, 0, 0]
    assert uflat[g.num_cells] == u[1, 0, 0, 0]
    np.testing.assert_array_equal(layout.vector_from_flat(uflat, g), u)


def test_assert_all_finite():
    checks.assert_all_finite({"a": jnp.ones(4)})
    with pytest.raises(FloatingPointError):
        checks.assert_all_finite({"a": jnp.asarray([1.0, np.nan])})


def test_checked_catches_nan():
    import jax

    def f(x):
        return jnp.log(x)  # nan for negative input

    err, out = jax.jit(checks.checked(f))(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()

    err, out = jax.jit(checks.checked(f))(jnp.asarray(2.0))
    err.throw()  # no error
    assert np.isfinite(float(out))


def test_gridspec_properties():
    g = GridSpec(nx=4, ny=5, nz=6)
    assert g.num_cells == 120
    assert g.shape == (6, 5, 4)
