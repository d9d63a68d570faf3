"""Component-level timing breakdown of the NGP train step.

Round-2 state: the hash-encoded extension trained ~10x slower than the
coordinate-MLP fused step (41.5 vs 4.09 ms at the flagship grid); this
script's breakdown pinned the cost on the encoder backward's scatter-adds,
which round 3 deleted (dense oversubscribed levels -> transposed-matmul
backward; 10.4 ms measured). It still slope-times the stages separately so
further optimization targets stay data, not guesswork:

    encode_grid fwd       per-level static corner gather + separable lerps
    generate_fields fwd   encoder + 3 decode-head evaluations
    3x decode head fwd    heads alone, on a carried encoding
    loss fwd              fields -> staged residuals -> loss
    value_and_grad        + the whole backward (incl. table scatter-adds)
    encoder fwd+bwd       encoder cost with its backward isolated

Run from repo root (defaults to the flagship grid; pass nx ny nz to
override — e.g. a tiny grid for a CPU smoke run):

    PYTHONPATH=.:$PYTHONPATH python scripts/ngp_profile.py [nx ny nz]

CAUTION (hardware): on 2026-08-17 the first timed loop (encode_grid alone
under the fori_loop harness) wedged the tunneled TPU worker — first compile
sat >16 min at zero CPU and the device then hung even for jax.devices().
If a first compile is silent for >5 min, kill the run and probe the device
with a short-timeout jax.devices() before retrying.
"""

import sys

import jax
import jax.numpy as jnp

# remote TPU compiles cost 1-2 min each; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phys_autodiff_tpu.bench.harness import time_loop
from phys_autodiff_tpu.models import ngp
from phys_autodiff_tpu.models.hash_encoder import encode_grid
from phys_autodiff_tpu.ops import loss_forward
from phys_autodiff_tpu.utils.config import GridSpec, PhysWeights


def main(nx=128, ny=96, nz=96):
    g = GridSpec(nx=nx, ny=ny, nz=nz, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    w = PhysWeights()
    ncfg = ngp.NGPFieldConfig()
    params = ngp.init_ngp_params(ncfg, seed=777)
    t_eval = jnp.float32(0.25)

    def perturbed(p, acc):
        # carry-dependent epsilon: keeps each iteration's inputs distinct so
        # nothing is loop-invariant (see bench/harness.py module docstring)
        return jax.tree_util.tree_map(lambda a: a * (1.0 + acc * 1e-20), p)

    def body_enc(i, carry):
        acc, p = carry
        enc = encode_grid(ncfg.encoding, p["tables"], g)
        return acc + jnp.sum(enc) * 1e-6, perturbed(p, acc)

    def body_fields(i, carry):
        acc, p = carry
        f = ngp.generate_fields(g, ncfg, p, t_eval, g.dt)
        s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(f))
        return acc + s * 1e-6, perturbed(p, acc)

    enc0 = jax.jit(lambda p: encode_grid(ncfg.encoding, p["tables"], g))(params)

    def body_head(i, carry):
        acc, enc = carry
        s = jnp.float32(0.0)
        for tt in (t_eval - g.dt, t_eval, t_eval + g.dt):
            s = s + jnp.sum(ngp._apply_head(params, enc, tt))
        return acc + s * 1e-6, enc * (1.0 + acc * 1e-20)

    def loss_fn(p):
        f = ngp.generate_fields(g, ncfg, p, t_eval, g.dt)
        l_s, l_u = loss_forward(g, w, f)
        return l_s + l_u

    def body_loss(i, carry):
        acc, p = carry
        return acc + loss_fn(p) * 1e-6, perturbed(p, acc)

    def body_grad(i, carry):
        acc, p = carry
        v, grads = jax.value_and_grad(loss_fn)(p)
        s = v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
        return acc + s * 1e-6, perturbed(p, acc)

    def body_enc_grad(i, carry):
        acc, p = carry

        def f(p):
            return jnp.sum(encode_grid(ncfg.encoding, p["tables"], g))

        v, grads = jax.value_and_grad(f)(p)
        s = v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
        return acc + s * 1e-6, perturbed(p, acc)

    z = jnp.float32(0.0)
    for name, body, carry0 in [
        ("encode_grid fwd", body_enc, (z, params)),
        ("generate_fields fwd", body_fields, (z, params)),
        ("3x decode head fwd", body_head, (z, enc0)),
        ("loss fwd", body_loss, (z, params)),
        ("value_and_grad", body_grad, (z, params)),
        ("encoder fwd+bwd", body_enc_grad, (z, params)),
    ]:
        ms = time_loop(body, carry0, target_seconds=2.0)
        print(f"{name:24s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/ngp_profile.py")
    if len(sys.argv) not in (1, 4):
        sys.exit("usage: python scripts/ngp_profile.py [nx ny nz]")
    dims = [int(a) for a in sys.argv[1:4]]
    main(*dims) if dims else main()
