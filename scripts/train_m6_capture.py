"""M6 convergence ON HARDWARE at the flagship grid (round-4 VERDICT #2a).

The reference's never-built M6 milestone sets the acceptance criterion:
training the MLP against the physics loss must drop the loss >= 90% within
the budgeted steps (/root/reference/REQUIREMENT.md:164-169). The CPU tests
prove it at toy scale (tests/test_train.py); this script demonstrates it on
the real TPU at the flagship benchmark grid (128x96x96, H=128) with the
fully-fused training step (mega forward + mega backward), and commits the
loss curve + wall time as a capture:

    PYTHONPATH=.:$PYTHONPATH python scripts/train_m6_capture.py

Writes build/train_m6_r5.json AND docs/captures/train_m6_r5.json (build/
is wiped by environment resets).

The loop runs as scan-based epochs (train.loop.make_train_epoch — ONE
dispatch per 100 steps): on this tunneled chip a step-at-a-time loop would
measure the ~25 ms dispatch round-trip, not the 2-4 ms training step.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from phys_autodiff_tpu.train import TrainConfig, init_state
from phys_autodiff_tpu.train.loop import make_train_epoch
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

EPOCH = 100
MAX_STEPS = 4000


def main():
    g = GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    mcfg = MLPGridConfig(dims=MLPDims(H=128))
    cfg = TrainConfig(
        steps=MAX_STEPS, learning_rate=3e-3, use_fused=True, seed=1,
        t=0.25,
    )
    print(f"M6 on hardware: grid {g.shape}, H=128, fused step, lr=3e-3",
          flush=True)
    epoch = make_train_epoch(g, PhysWeights(), mcfg, cfg, EPOCH)
    state = init_state(cfg, mcfg)

    t0 = time.perf_counter()
    losses = []
    first = None
    steps_done = 0
    while steps_done < MAX_STEPS:
        state, trace = epoch(state)
        trace = np.asarray(jax.block_until_ready(trace), np.float64)
        assert np.all(np.isfinite(trace)), "non-finite loss in epoch"
        losses.extend(trace.tolist())
        if first is None:
            first = losses[0]
        steps_done += EPOCH
        drop = 100 * (1 - losses[-1] / first)
        print(f"  step {steps_done:5d}  loss {losses[-1]:.6e}  "
              f"({drop:.1f}% drop)", flush=True)
        if losses[-1] <= 0.1 * first and steps_done >= 2 * EPOCH:
            break
    elapsed = time.perf_counter() - t0
    last = losses[-1]
    drop = 100 * (1 - last / first)
    ok = last <= 0.1 * first
    print(
        f"\nflagship M6: {steps_done} steps in {elapsed:.1f}s "
        f"(incl. compile); loss {first:.4e} -> {last:.4e} ({drop:.1f}% "
        f"drop; criterion >= 90%): {'PASS' if ok else 'FAIL'}",
        flush=True,
    )

    capture = {
        "grid": [g.nx, g.ny, g.nz], "H": 128, "lr": 3e-3,
        "step_variant": "fused (mega fwd + mega bwd)",
        "steps": steps_done, "wall_s_incl_compile": round(elapsed, 2),
        "loss_first": first, "loss_last": last,
        "drop_pct": round(drop, 2), "criterion": ">= 90% drop",
        "criterion_source": "/root/reference/REQUIREMENT.md:164-169",
        "pass": bool(ok),
        # decimated curve: every 10th step + the final value
        "curve_step_loss": (
            [[i + 1, losses[i]] for i in range(0, len(losses), 10)]
            + [[len(losses), last]]
        ),
    }
    os.makedirs("build", exist_ok=True)
    blob = json.dumps(capture, indent=1)
    for path in ("build/train_m6_r5.json", "docs/captures/train_m6_r5.json"):
        with open(path, "w") as f:
            f.write(blob + "\n")
        print(f"wrote {path}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/train_m6_capture.py")
    sys.exit(main())
