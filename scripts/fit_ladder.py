"""Compression-quality ladder for the hash-NGP field family.

The fit table (scripts/fit_bench.py) measures SPEED at the framework's
default NGP schedule (max_resolution=128, dense oversubscribed levels),
whose parameter count exceeds one flagship snapshot — 0.8x "compression".
That config exists to maximize quality and train-step speed; Instant-NGP's
actual selling point is the OTHER end of the dial: a compact model that
reproduces the data at high PSNR. This script measures the dial — the
PSNR-vs-compression Pareto of the encoding schedule, every row trained
through the same fused fit engine (train/fit_field engine="auto" ->
pallas/fit.ngp_fit_loss_and_grad on TPU):

  * dense ladder: max_resolution 128 / 96 / 64 / 48 / 32 with
    dense_oversubscribed=True (scatter-free backward at every point);
  * all-hash rows: the literal Instant-NGP configuration (hashed top
    levels, T=2^14 and T=2^12) — collisions trade PSNR for parameters,
    and the table backward pays the corner-lattice scatter-add
    (docs/DESIGN.md "Dense levels") — measured honestly with --timed;
  * the coordinate MLP (H=128) as the extreme-compression anchor.

Usage: python scripts/fit_ladder.py [steps] [--timed]
  --timed additionally slope-times ms/step per row (adds one long remote
  compile per row; quality/compression need only the fit itself).

Output: one JSON line on stdout, CSV rows on stderr, and
build/fit_ladder.json for scripts/make_report.py's ladder section.
"""

from __future__ import annotations

import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fit_bench import make_target  # noqa: E402

from phys_autodiff_tpu.models.hash_encoder import HashEncodingConfig
from phys_autodiff_tpu.models.ngp import NGPFieldConfig
from phys_autodiff_tpu.train import TrainConfig
from phys_autodiff_tpu.train import fit_field as ff
from phys_autodiff_tpu.utils.config import GridSpec, MLPDims, MLPGridConfig


def ladder_configs() -> list:
    """(name, model_cfg, lr) rows, densest to most compressed."""
    rows = []
    for mx in (128, 96, 64, 48, 32):
        enc = HashEncodingConfig(
            max_resolution=mx, dense_oversubscribed=True
        )
        rows.append((f"ngp_dense_r{mx}", NGPFieldConfig(encoding=enc), 5e-3))
    for lt in (14, 12):
        enc = HashEncodingConfig(
            max_resolution=128, log2_table_size=lt,
            dense_oversubscribed=False,
        )
        rows.append((f"ngp_hash_r128_t{lt}", NGPFieldConfig(encoding=enc), 5e-3))
    rows.append(("mlp_h128", MLPGridConfig(dims=MLPDims(H=128)), 3e-3))
    return rows


def run_row(name, g, mcfg, tgt, steps, lr, timed: bool) -> dict:
    tc = TrainConfig(steps=steps, learning_rate=lr, seed=0)
    params, losses = ff.fit_field(g, mcfg, [tgt], tc, engine="auto")
    rep = ff.fit_report(g, mcfg, params, [tgt])
    row = {
        "steps": steps,
        "loss_first": float(losses[0]),
        "loss_last": float(losses[-1]),
        "psnr_sigma_db": rep["snapshots"][0]["psnr_sigma_db"],
        "psnr_u_db": rep["snapshots"][0]["psnr_u_db"],
        "compression_ratio": rep["compression_ratio"],
        "param_bytes": rep["param_bytes"],
    }
    if timed:
        import optax

        from phys_autodiff_tpu.bench.harness import time_loop
        from phys_autodiff_tpu.train.fit_field import _make_mega_loss_and_grad
        from phys_autodiff_tpu.train.loop import make_optimizer
        from phys_autodiff_tpu.utils.config import PhysWeights

        if ff._resolve_fit_engine("auto", g, mcfg, 0.0) == "mega":
            lag = _make_mega_loss_and_grad(
                g, mcfg, [tgt], PhysWeights(), 0.0, PhysWeights(), "f32"
            )
        else:
            loss_fn = ff.make_fit_loss(g, mcfg, [tgt])

            def lag(params):
                return jax.value_and_grad(loss_fn)(params)

        opt = make_optimizer(tc)
        params0 = ff.init_any(mcfg, seed=0)

        def body(i, carry):
            p, s = carry
            _, grads = lag(p)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s

        row["ms_per_step"] = time_loop(body, (params0, opt.init(params0)))
    print(
        f"fit_ladder,{name},{steps},{row['param_bytes']},"
        f"{row['compression_ratio']:.1f},{row['psnr_sigma_db']:.2f},"
        f"{row['psnr_u_db']:.2f},{row.get('ms_per_step', float('nan')):.4f}",
        file=sys.stderr,
    )
    return row


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--timed"]
    timed = "--timed" in sys.argv[1:]
    steps = int(args[0]) if args else 300
    g = GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    tgt = make_target(g)
    rows = {
        name: run_row(name, g, mcfg, tgt, steps, lr, timed)
        for name, mcfg, lr in ladder_configs()
    }
    payload = {
        "metric": "fit_compression_ladder",
        "grid": [g.nx, g.ny, g.nz],
        "rows": rows,
    }
    print(json.dumps(payload))
    # build/ for the report run, docs/captures/ as the GIT-COMMITTED copy
    # (environment resets wipe build/; round-3 VERDICT #5)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = [os.path.join(repo, "build", "fit_ladder.json")]
    if jax.default_backend() != "cpu":
        # only a REAL-hardware run may refresh the committed evidence —
        # a CPU/interpret run must not clobber it (review finding, round 4)
        paths.append(
            os.path.join(repo, "docs", "captures", "fit_ladder.json"))
    for path in paths:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/fit_ladder.py")
    main()
