"""Multi-step sharded CONVERGENCE on the 8-device mesh (round-4 VERDICT #2b).

The sharding tests pin 1-3-step parity; this file proves distribution over a
TRAJECTORY: the reference's M6 acceptance criterion — training must drop the
physics loss >= 90% within the budgeted steps
(/root/reference/REQUIREMENT.md:164-169) — demonstrated ON THE MESH, for
both distribution arms:

  * the GSPMD staged step (XLA inserts halo collectives + grad all-reduce)
  * the shard_map + ppermute explicit-halo step running the fused Pallas
    kernels per shard (interpret mode on the CPU mesh)

and, as the cross-check that the distributed trajectory IS the single-chip
trajectory, the sharded loss sequence is compared step-by-step against the
unsharded fused step from the same init.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.parallel import (
    make_mesh,
    make_sharded_fused_train_step,
    make_sharded_train_step,
)
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

N_DEV = 8
G = GridSpec(nx=16, ny=16, nz=16, hx=0.4, hy=0.4, hz=0.4, dt=1e-2)
W = PhysWeights()
MCFG = MLPGridConfig(dims=MLPDims(H=32))


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must provide 8 CPU devices"
    return make_mesh(N_DEV)


def test_gspmd_sharded_training_drops_90_percent(mesh):
    step, init = make_sharded_train_step(G, W, MCFG, mesh, learning_rate=3e-3)
    params, opt_state = init(mlp.init_params(MCFG.dims, seed=1))
    t = jnp.float32(0.25)
    first = None
    for i in range(300):
        params, opt_state, loss = step(params, opt_state, t)
        # Fetch the loss EVERY step to bound in-flight executions at 1.
        # 300 un-synchronized async dispatches of an 8-device program
        # abort the CPU PJRT client (SIGABRT) once the process has prior
        # executed programs — a runtime resource limit, reproduced with
        # any single test file run before this one. The framework's own
        # loops (train/loop.py, train/resilient.py) fetch per burst and
        # never dispatch unboundedly.
        last = float(loss)
        if first is None:
            first = last
    assert np.isfinite(last)
    assert last <= 0.1 * first, f"sharded loss only dropped {first} -> {last}"


def test_shardmap_fused_training_drops_90_percent_and_matches_single(mesh):
    """The fused shard_map arm converges >= 90% AND its per-step losses sit
    on the single-device fused step's trajectory (1e-5 rel per step — same
    math, deterministic slab reduction)."""
    from phys_autodiff_tpu.train.slab_grad import make_fused_loss
    import optax

    steps = 150
    lr = 3e-3
    step_n, init_n = make_sharded_fused_train_step(
        G, W, MCFG, mesh, learning_rate=lr, sz=1
    )
    params_n, opt_n = init_n(mlp.init_params(MCFG.dims, seed=1))

    # single-device twin from the same init
    opt = optax.adam(lr)
    loss_fn = make_fused_loss(G, W, MCFG)
    params_1 = mlp.init_params(MCFG.dims, seed=1)
    opt_1 = opt.init(params_1)

    @jax.jit
    def step_1(p, o, t):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, t))(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    t = jnp.float32(0.25)
    first = None
    for i in range(steps):
        params_n, opt_n, loss_n = step_n(params_n, opt_n, t)
        params_1, opt_1, loss_1 = step_1(params_1, opt_1, t)
        ln, l1 = float(loss_n), float(loss_1)
        if first is None:
            first = ln
        assert abs(ln - l1) <= 1e-5 * max(abs(l1), 1e-6), (i, ln, l1)
    assert np.isfinite(ln)
    assert ln <= 0.1 * first, f"fused sharded loss only dropped {first} -> {ln}"
