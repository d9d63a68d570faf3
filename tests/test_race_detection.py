"""Race detection over the hand-written DMA kernels.

The reference has no sanitizers at all (survey §5: zero CUDA error checking,
no compute-sanitizer hooks — a gap we are told not to replicate). Pallas TPU
interpret mode ships a race detector (vector clocks over simulated DMAs and
semaphores); running the manual-DMA kernels under it checks that the
double-buffered halo staging has no read/write hazards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.pallas.residuals import (
    _run_fused,
    pack_fields,
    residuals_fused_packed,
)
from phys_autodiff_tpu.ref import manufactured
from phys_autodiff_tpu.ops.stencil import FieldSnapshots
from phys_autodiff_tpu.utils.config import GridSpec
from phys_autodiff_tpu.utils.metrics import rel_l2_err

L = 2 * np.pi


def _grid():
    # nz=24, slab sizes > 1 => interior + edge DMA paths both exercised
    return GridSpec(
        nx=128, ny=8, nz=24, hx=L / 128, hy=L / 8, hz=L / 24, dt=1e-3
    )


def _snapshots(g):
    f = manufactured.solution2_fields(g, 0.7)
    return FieldSnapshots(**{k: jnp.asarray(v) for k, v in f.items()})


@pytest.mark.parametrize("kernel", ["multistream", "packed"])
def test_manual_dma_kernels_race_free(kernel):
    g = _grid()
    fs = _snapshots(g)
    params = pltpu.InterpretParams(detect_races=True)
    if kernel == "packed":
        out = residuals_fused_packed(g, pack_fields(fs), interpret=params)
        rs, ru = out[0], out[1:4]
    else:
        rs, ru = _run_fused(g, fs, None, False, params)
    # correctness under the detector, and the detector itself raises or
    # warns on a detected race
    rs_s, ru_s = ops.residuals(g, fs)
    assert rel_l2_err(rs, rs_s) <= 1e-7
    assert rel_l2_err(ru, ru_s) <= 1e-7


def test_mega_kernels_race_free():
    """The mega kernels keep rolling windows in scratch across sequential
    grid programs — the race detector checks the window writes never race
    with cross-program reads."""
    from phys_autodiff_tpu.models import generate_fields, mlp
    from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline
    from phys_autodiff_tpu.pallas.mega_bwd import mega_loss_and_grad
    from phys_autodiff_tpu.utils.config import MLPDims, MLPGridConfig, PhysWeights

    g = GridSpec(nx=128, ny=8, nz=6, hx=0.3, hy=0.3, hz=0.3, dt=1e-2)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=32))
    params = mlp.init_params(cfg.dims, seed=3)
    t = jnp.float32(0.25)
    ip = pltpu.InterpretParams(detect_races=True)

    fs = generate_fields(g, cfg, params, t, g.dt)
    ls_ref, lu_ref = ops.loss_forward(g, w, fs)
    ls, lu = mega_loss_pipeline(g, w, cfg, params, t, "f32", ip)
    assert abs(float(ls) - float(ls_ref)) / abs(float(ls_ref)) <= 1e-5
    assert abs(float(lu) - float(lu_ref)) / abs(float(lu_ref)) <= 1e-5

    l, (gp, _) = mega_loss_and_grad(g, w, cfg, params, t, "f32", ip)
    assert np.isfinite(float(l))
    assert all(np.all(np.isfinite(np.asarray(v))) for v in gp.values())
