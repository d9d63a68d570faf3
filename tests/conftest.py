"""Test environment: force the CPU backend with 8 virtual devices.

The standard JAX way to test multi-chip sharding without a cluster: the
sharding/parity tests build a jax.sharding.Mesh over 8 host-CPU devices.
These env vars must be set before jax initializes its backends, which is why
they live in conftest (imported before any test module imports jax).

The real-TPU paths are exercised by bench.py and __graft_entry__.py, which
the driver runs on hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
