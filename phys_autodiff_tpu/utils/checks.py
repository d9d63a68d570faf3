"""Numerical-health guards.

The reference checks NaN/Inf only at the MLP->physics integration boundary
in a test (test/test_mlp_phys_integration_inputs.cpp:25-27) and otherwise
ignores every error code (survey §5 "race detection / sanitizers: absent —
do not replicate this gap"). Here the guards are first-class:

  * `assert_all_finite(tree)` — host-side check of any pytree.
  * `checked(fn)` — wraps a jitted function with jax.experimental.checkify
    so NaN/Inf produced anywhere inside surfaces as a checked error without
    leaving the device.
  * `guard_fields(fields)` — in-graph finite guard usable inside jit (joins
    the forward pass; errors surface via checkify when enabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def assert_all_finite(tree, name: str = "tree") -> None:
    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(
                f"non-finite values in {name} (leaf {i}, shape {arr.shape})"
            )


def guard_fields(fields, name: str = "fields"):
    """In-graph guard: checkify.check on every leaf; returns fields
    unchanged. Compose under `checked`."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(fields)):
        checkify.check(
            jnp.all(jnp.isfinite(leaf)), f"non-finite values in {name}[{i}]"
        )
    return fields


def checked(fn):
    """Wrap fn so checkify errors (including automatic NaN/div checks) are
    tracked; returns (err, out) like checkify.checkify. Call
    err.throw() on the host to raise."""
    return checkify.checkify(fn, errors=checkify.float_checks)
