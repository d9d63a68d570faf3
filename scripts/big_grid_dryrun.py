"""Train one step at a grid the round-1 single-chip path could not compile.

At 224x192x192 (8.26 M cells) with H=128, the plain jax.grad backward keeps
a [3N, H] float32 activation residual of 12.7 GB plus comparable
intermediates — past the single-chip HBM (docs/DESIGN.md round-1 noted the
compile-time failure at >= 4M cells). The slab-blocked recompute gradient
(train/slab_grad.py) bounds live memory by the slab, and the sharded fused
step splits the slabs over a mesh, so the same step compiles and runs both
single-device and on the 8-way CPU mesh.

Run on the CPU mesh (the standard JAX multi-chip stand-in):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/big_grid_dryrun.py [--quick]

--quick drops to 96x96x96 / H=32 so the single-CPU-core run finishes fast;
the full shape is sized for a real multi-chip mesh (or patience).
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# remote TPU compiles cost 1-2 min each; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    from jax.sharding import Mesh

    from phys_autodiff_tpu.models import mlp
    from phys_autodiff_tpu.parallel.sharded import make_sharded_fused_train_step
    from phys_autodiff_tpu.utils.config import (
        GridSpec,
        MLPDims,
        MLPGridConfig,
        PhysWeights,
    )

    if args.quick:
        g = GridSpec(nx=96, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        h = 32
    else:
        g = GridSpec(nx=224, ny=192, nz=192, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
        h = 128
    mcfg = MLPGridConfig(dims=MLPDims(H=h))
    resid_gb = 3 * g.num_cells * h * 4 / 1e9
    print(
        f"grid {g.shape} = {g.num_cells/1e6:.2f} M cells, H={h}: the round-1 "
        f"jax.grad backward would retain a {resid_gb:.1f} GB activation "
        "residual; the slab gradient retains none of it."
    )

    devices = jax.devices()[: args.devices]
    mesh = Mesh(np.asarray(devices), ("z",))
    params = mlp.init_params(mcfg.dims, seed=0)
    step, init = make_sharded_fused_train_step(
        g, PhysWeights(), mcfg, mesh, sz=g.nz // (8 * len(devices)) or 1
    )
    p, o = init(params)

    t0 = time.perf_counter()
    p, o, loss = step(p, o, jnp.float32(0.25))
    loss = float(jax.block_until_ready(loss))
    t1 = time.perf_counter()
    assert np.isfinite(loss), loss
    print(f"sharded fused step ok: mesh={mesh.shape} loss={loss:.6f} "
          f"(compile+step {t1-t0:.1f}s on {len(devices)} CPU devices)")

    p, o, loss2 = step(p, o, jnp.float32(0.25))
    loss2 = float(jax.block_until_ready(loss2))
    print(f"second step: loss {loss2:.6f} ({'down' if loss2 < loss else 'up'})")
    return 0


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/big_grid_dryrun.py")
    sys.exit(main())
