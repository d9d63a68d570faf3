"""Capture a jax.profiler device trace of the benchmark scopes.

The reference separates kernel-only (CUDA events) from wrapper-E2E
(steady_clock) timing; the slope-method harness is this framework's primary
equivalent, and this script is the profiler-trace arm: each benchmark scope
runs several times under a named TraceAnnotation inside one device trace,
so kernel durations can be read directly from the timeline (TensorBoard /
Perfetto, trace dir printed at the end).

    PYTHONPATH=.:$PYTHONPATH python scripts/profile_trace.py [--out DIR]
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="build/profile_trace")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "build", "jax_cache"),
    )

    from phys_autodiff_tpu import ops
    from phys_autodiff_tpu.bench.harness import random_fields
    from phys_autodiff_tpu.models import mlp
    from phys_autodiff_tpu.pallas.mega import mega_loss_pipeline
    from phys_autodiff_tpu.pallas.mega_bwd import mega_loss_and_grad
    from phys_autodiff_tpu.pallas.mlp import generate_fields_fused_packed
    from phys_autodiff_tpu.pallas.residuals import (
        loss_forward_fused_packed,
        pack_fields,
        residuals_fused_packed,
    )
    from phys_autodiff_tpu.utils import timing
    from phys_autodiff_tpu.utils.config import (
        GridSpec,
        MLPDims,
        MLPGridConfig,
        PhysWeights,
    )

    g = GridSpec(nx=128, ny=96, nz=96, hx=0.05, hy=0.05, hz=0.05, dt=1e-3)
    w = PhysWeights()
    cfg = MLPGridConfig(dims=MLPDims(H=128))
    params = mlp.init_params(cfg.dims, seed=777)
    fs = random_fields(g)
    packed = jax.block_until_ready(pack_fields(fs))
    t = jnp.float32(0.25)

    scopes = {
        "residual_kernel": jax.jit(lambda p: residuals_fused_packed(g, p)),
        "loss_kernel": jax.jit(lambda p: loss_forward_fused_packed(g, w, p)),
        "staged_residuals": jax.jit(lambda s: ops.residuals(g, fs._replace(sigma_t=s))),
        "mlp_fieldgen": jax.jit(lambda pp: generate_fields_fused_packed(g, cfg, pp, 0.25)),
        "mega_pipeline": jax.jit(lambda pp: mega_loss_pipeline(g, w, cfg, pp, t)),
        "mega_loss_and_grad": jax.jit(
            lambda pp: mega_loss_and_grad(g, w, cfg, pp, t)
        ),
    }
    args_for = {
        "residual_kernel": packed,
        "loss_kernel": packed,
        "staged_residuals": fs.sigma_t,
        "mlp_fieldgen": params,
        "mega_pipeline": params,
        "mega_loss_and_grad": params,
    }

    # compile everything outside the trace
    for name, fn in scopes.items():
        jax.block_until_ready(fn(args_for[name]))

    os.makedirs(args.out, exist_ok=True)
    with timing.trace(args.out, perfetto=True):
        for name, fn in scopes.items():
            with timing.annotate(name):
                for _ in range(args.iters):
                    out = fn(args_for[name])
                jax.block_until_ready(out)
    print(f"trace written to {args.out} (open with TensorBoard/Perfetto); "
          f"scopes: {', '.join(scopes)}")
    table = aggregate_perfetto(args.out, args.iters)
    if table is not None:
        import json

        blob = json.dumps(table, indent=1)
        for path in ("build/profile_trace_r5.json",
                     "docs/captures/profile_trace_r5.json"):
            with open(path, "w") as f:
                f.write(blob + "\n")
            print(f"wrote {path}")
    return 0


def aggregate_perfetto(out_dir: str, iters: int):
    """Parse the perfetto trace and emit the per-kernel device-time table —
    the committed trace-derived evidence the reference aspired to get from
    Nsight (/root/reference/REQUIREMENT.md:207-209): actual device-timeline
    durations per compiled kernel/fusion, not analytic models. Returns None
    (with a note) if no perfetto trace was produced."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = glob.glob(
        os.path.join(out_dir, "plugins", "profile", "*", "*.json.gz")
    )
    if not paths:
        print("# no perfetto trace found — table skipped")
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    # device-track slices: complete events ("X") on TPU pids; host python
    # annotation slices share names with `scopes` and live on host threads.
    durs = defaultdict(lambda: [0.0, 0])
    ann = defaultdict(lambda: [0.0, 0])
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        pid = e.get("pid")
        on_device = "TPU" in pid_names.get(pid, "")
        if on_device:
            durs[name][0] += float(e.get("dur", 0.0))
            durs[name][1] += 1
        elif name in (
            "residual_kernel", "loss_kernel", "staged_residuals",
            "mlp_fieldgen", "mega_pipeline", "mega_loss_and_grad",
        ):
            ann[name][0] += float(e.get("dur", 0.0))
            ann[name][1] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:20]
    print("\n# per-kernel device time (perfetto trace), top 20:")
    print(f"# {'total_us':>10} {'calls':>6} {'mean_us':>9}  kernel")
    rows = []
    for name, (tot, n) in top:
        print(f"  {tot:10.1f} {n:6d} {tot / max(n, 1):9.2f}  {name[:90]}")
        rows.append({
            "kernel": name, "total_us": round(tot, 1), "calls": n,
            "mean_us": round(tot / max(n, 1), 2),
        })
    scope_rows = {
        name: {"total_us": round(tot, 1), "calls": n,
               "mean_us_per_iter": round(tot / max(n, 1) / iters, 2)}
        for name, (tot, n) in ann.items()
    }
    return {
        "note": (
            "device-timeline durations from a jax.profiler perfetto trace "
            "on the real chip; the Nsight-metrics analogue "
            "(reference REQUIREMENT.md:207-209). Host annotation scopes "
            "include dispatch/tunnel overhead; per-kernel device rows do "
            "not."
        ),
        "iters_per_scope": iters,
        "device_kernels_top": rows,
        "annotation_scopes_host_us": scope_rows,
    }


if __name__ == "__main__":
    from phys_autodiff_tpu.utils.freeze import assert_not_frozen

    assert_not_frozen("scripts/profile_trace.py")
    sys.exit(main())
