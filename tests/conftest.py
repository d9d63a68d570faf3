"""Test environment: force the CPU backend with 8 virtual devices.

The standard JAX way to test multi-chip sharding without a cluster: the
sharding/parity tests build a jax.sharding.Mesh over 8 host-CPU devices.

Gotcha: this machine's TPU plugin is registered by a sitecustomize that
pre-imports jax at interpreter startup, so setting JAX_PLATFORMS in the
environment here is too late. Backends initialize lazily, though, so
switching via jax.config before the first device use still works — that is
what this file does (and why it must stay the first thing pytest imports).

The real-TPU paths are exercised by bench.py, scripts/, and
__graft_entry__.py, which the driver runs on hardware.
"""

import os

# Read when the CPU client is created (lazily), so still effective post-import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
