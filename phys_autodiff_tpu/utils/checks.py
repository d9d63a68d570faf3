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
    if not leaves:
        return
    # One host sync for the whole tree: per-leaf reductions dispatch
    # asynchronously, then a single stacked flag vector crosses the (slow,
    # ~25 ms round-trip) device link — not one blocking float() per leaf.
    flags = jax.device_get(
        jnp.stack([jnp.all(jnp.isfinite(jnp.asarray(l))) for l in leaves])
    )
    if not flags.all():
        bad = [i for i, ok in enumerate(flags) if not ok]
        raise FloatingPointError(f"non-finite values in {name} (leaves {bad})")


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
