"""Device-mesh construction and sharding specs.

The reference is strictly single-GPU (survey §2: DP/TP/PP/SP/EP all absent;
the only "communication" is cudaMemcpy). The natural parallelism for this
workload — a dense 3D stencil over MLP-generated fields — is spatial domain
decomposition of the grid's z axis (data parallelism with +-1-plane halo
exchange) with replicated MLP weights and all-reduced gradients, laid out so
collectives ride the ICI.

Axis naming: one mesh axis "z" shards the leading (nz) dimension of scalar
fields and dim 1 of [3, nz, ny, nx] vector fields. Params and scalars are
replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phys_autodiff_tpu.ops.stencil import FieldSnapshots

Z_AXIS = "z"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the z axis. Defaults to all available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (Z_AXIS,))


def scalar_spec() -> P:
    return P(Z_AXIS, None, None)


def vector_spec() -> P:
    return P(None, Z_AXIS, None, None)


def field_shardings(mesh: Mesh) -> FieldSnapshots:
    """NamedShardings for a FieldSnapshots pytree, z-sharded."""
    s = NamedSharding(mesh, scalar_spec())
    v = NamedSharding(mesh, vector_spec())
    return FieldSnapshots(
        sigma_tm1=s, sigma_t=s, sigma_tp1=s, u_tm1=v, u_t=v, u_tp1=v
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_fields(mesh: Mesh, fields: FieldSnapshots) -> FieldSnapshots:
    sh = field_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, fields, sh)
