"""Training demo on hardware: fit the MLP against the physics loss and show
the loss curve (the reference's never-built M6 milestone). Run from repo root:

    PYTHONPATH=.:$PYTHONPATH python scripts/train_demo.py [steps]
"""

import sys

from phys_autodiff_tpu.train import TrainConfig, fit
from phys_autodiff_tpu.utils.config import (
    GridSpec,
    MLPDims,
    MLPGridConfig,
    PhysWeights,
)

if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    g = GridSpec(nx=64, ny=64, nz=64, hx=0.1, hy=0.1, hz=0.1, dt=1e-3)
    cfg = TrainConfig(steps=steps, learning_rate=3e-3, log_every=max(1, steps // 20))
    state, history, elapsed = fit(
        g, PhysWeights(), MLPGridConfig(dims=MLPDims(H=64)), cfg,
        callback=lambda s, l: print(f"step {s:5d}  loss {l:.6e}"),
    )
    first, last = history[0][1], history[-1][1]
    drop = 100 * (1 - last / first)
    print(f"\n{steps} steps in {elapsed:.1f}s; loss {first:.4e} -> {last:.4e} "
          f"({drop:.1f}% drop; reference criterion: >=90%)")
