"""Training demo on hardware: fit a field model against the physics loss
and show the loss curve (the reference's never-built M6 milestone). Run
from repo root:

    PYTHONPATH=.:$PYTHONPATH python scripts/train_demo.py [steps] [model]

model: "mlp" (default, the reference's coordinate MLP) or "ngp" (the
hash-encoded field extension).
"""

import sys
import time

from phys_autodiff_tpu.train import TrainConfig, fit
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)


def _fit_ngp(g, cfg):
    from phys_autodiff_tpu.models import ngp
    from phys_autodiff_tpu.train import make_generic_train_step

    ncfg = ngp.NGPFieldConfig()
    params = ngp.init_ngp_params(ncfg, seed=cfg.seed)
    step, state = make_generic_train_step(
        g, PhysWeights(),
        lambda p, t: ngp.generate_fields(g, ncfg, p, t, g.dt), cfg, params,
    )
    history = []
    t0 = time.perf_counter()
    for i in range(cfg.steps):
        state, loss = step(state)
        if i % cfg.log_every == 0 or i == cfg.steps - 1:
            loss_f = float(loss)
            history.append((i + 1, loss_f))
            print(f"step {i + 1:5d}  loss {loss_f:.6e}")
    return history, time.perf_counter() - t0


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    model = sys.argv[2] if len(sys.argv) > 2 else "mlp"
    g = GridSpec(nx=64, ny=64, nz=64, hx=0.1, hy=0.1, hz=0.1, dt=1e-3)
    cfg = TrainConfig(steps=steps, learning_rate=3e-3, log_every=max(1, steps // 20))
    if model == "ngp":
        history, elapsed = _fit_ngp(g, cfg)
    else:
        state, history, elapsed = fit(
            g, PhysWeights(), MLPGridConfig(dims=MLPDims(H=64)), cfg,
            callback=lambda s, l: print(f"step {s:5d}  loss {l:.6e}"),
        )
    first, last = history[0][1], history[-1][1]
    drop = 100 * (1 - last / first)
    print(f"\n{model}: {steps} steps in {elapsed:.1f}s; loss {first:.4e} -> "
          f"{last:.4e} ({drop:.1f}% drop; reference criterion: >=90%)")
