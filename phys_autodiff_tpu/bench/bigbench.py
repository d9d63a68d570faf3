"""Big-grid benchmark + parity: proving the framework at a scale the
reference cannot touch (round-4 VERDICT #1).

The reference's own memory-ceiling discussion
(/root/reference/docs/PLAN_MLP_SMOKE_INTEGRATION.md:55 — 12*N floats of
field storage) caps its benchmark grids at 128x96x96 = 1.18 M cells; its
fused CUDA kernel was never demonstrated beyond that. The TPU design keeps
nothing grid-sized live beyond the 12 input + 4 output planes (the packed
one-DMA kernel streams z-slabs through VMEM; the training step's mega
backward keeps all parameter gradients in VMEM accumulators), so the SAME
kernels run at 256-class grids:

    128 x 128 x 768  = 12.58 M cells   (~10.7x the flagship)
    128 x 128 x 1024 = 16.78 M cells   (~14.2x the flagship, = 256^3 cells)

Sizing: packed f32 inputs at 16.78 M cells are 12 * 16.78M * 4 B = 805 MB,
outputs 268 MB — comfortably inside the 16 GB single-chip HBM; the training
step needs only slab-sized intermediates beyond that (the staged jax.grad
backward, by contrast, would retain a [3N, H] activation residual of
~25.8 GB at H=128 — impossible; that arm is structurally excluded here,
exactly like the reference excludes grids past its HBM).

Box aspect (measured, 2026-08-20 campaign): the scale lives in nz — the
dimension the kernel streams and the multi-chip path shards — while the
plane stays flagship-class (128x128), for two measured reasons:
  * The packed kernel streams whole [sz, ny, nx] planes through VMEM
    (~(32*sz+16) plane buffers across BlockSpec pipelining + halo scratch),
    so big planes force tiny slabs: 256x256 planes (262 kB) exceed even
    the sz=1 scoped-VMEM window (18 MB > 16 MB limit), and 128x256 planes
    compile but drop to sz=1 where per-program fixed costs dominate
    (measured 2.74 ms at 12.58 M cells = 10% roofline, vs sz=4 at
    flagship-class planes). 128x128 planes keep the flagship's sz=4.
  * The backward mega-kernel's dCD accumulator is VMEM-resident across
    the z sweep (pallas/mega_bwd.py:mega_fits) — deep-z grids exceed it
    regardless of plane shape, so big-grid training routes to the
    slab-recompute gradient (train/slab_grad.py), which is exactly what
    that module exists for.
Total cells, traffic, and roofline are aspect-independent for this
bandwidth-bound stencil; only the box shape differs from a cube.

Everything here is generated ON DEVICE (jax.random): materializing 805 MB
host-side on the 1-core host and pushing it through the tunnel would
dominate the wall time and prove nothing.

Parity doctrine at the big grids is the same fused-vs-staged contract as
the benchmark grids (utils/tolerances.py: rel 1e-7-class agreement between
two f32 arms of the same exact-arithmetic function, bound 1e-6 rel / 1e-3
max-abs scaled): errors are computed on device, only scalars travel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.bench.harness import (
    PhysRow,
    time_packed_op,
)
from phys_autodiff_tpu.ops.stencil import FieldSnapshots
from phys_autodiff_tpu.utils.config import GridSpec, MLPDims, MLPGridConfig, PhysWeights

BIG_GRIDS = [(128, 128, 768), (128, 128, 1024)]

# Two bandwidth regimes, both measured on this chip (2026-08-20 campaign,
# scripts/bigz_experiments.py + scripts/dma_experiments.py):
#
#   * VMEM-resident (working set <= ~125 MB — every reference benchmark
#     grid): the 56 MB flagship copy probe runs at 2.85 TB/s because XLA
#     keeps the loop-carried buffers in the 128 MB VMEM (S(1) layouts in
#     the compiled HLO). The reference's GPU benchmark sits in the same
#     regime against its 96 MB L2, so flagship comparisons are
#     like-for-like.
#   * HBM-streamed (big grids): a single-buffer scaled-copy at 302/604 MB
#     measures 0.655/0.657 TB/s read+write — ~80% of the chip's HBM spec
#     and the honest ceiling for grids whose planes cannot stay resident.
_VMEM_COPY_TBS = 2.85
_HBM_COPY_TBS = 0.657


def device_random_fields(g: GridSpec, seed: int = 0) -> FieldSnapshots:
    """FieldSnapshots drawn on device — no host materialization, no tunnel
    transfer (the big-grid inputs are ~1 GB)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    mk = lambda k, s: jax.random.normal(k, s, jnp.float32)
    return FieldSnapshots(
        sigma_tm1=mk(keys[0], g.shape),
        sigma_t=mk(keys[1], g.shape),
        sigma_tp1=mk(keys[2], g.shape),
        u_tm1=mk(keys[3], (3,) + g.shape),
        u_t=mk(keys[4], (3,) + g.shape),
        u_tp1=mk(keys[5], (3,) + g.shape),
    )


def roofline_pct(
    ms: float, cells: int, bytes_per_cell: int = 64,
    ceiling_tbs: float = _HBM_COPY_TBS,
) -> float:
    """Percent of the measured copy-bandwidth ceiling the row achieves at
    its mandatory traffic (12 planes read + 4 written per cell). The
    default ceiling is the HBM-streamed one — the regime the big grids
    live in; pass _VMEM_COPY_TBS for working sets that fit VMEM."""
    tbs = cells * bytes_per_cell / (ms / 1e3) / 1e12
    return 100.0 * tbs / ceiling_tbs


def big_parity(g: GridSpec, seed: int = 0) -> dict:
    """Fused-vs-staged parity at a big grid, on device.

    Returns {"resid_rel", "resid_max_scaled", "loss_sigma_rel",
    "loss_u_rel"} as floats (max-abs is scaled by the staged arm's max so
    the bound is scale-free like the doctrine's rel bounds).
    """
    from phys_autodiff_tpu.pallas.residuals import (
        loss_forward_fused_packed,
        pack_fields,
        residuals_fused_packed,
    )

    w = PhysWeights(w_sigma=1.3, w_u=0.7)
    fs = device_random_fields(g, seed)
    packed = pack_fields(fs)

    @jax.jit
    def errs(fs, packed):
        rs_s, ru_s = ops.residuals(g, fs)
        out = residuals_fused_packed(g, packed)
        ref = jnp.concatenate([rs_s[None], ru_s], axis=0)
        num = jnp.linalg.norm((out - ref).ravel())
        den = jnp.linalg.norm(ref.ravel())
        rel = num / den
        mx = jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref))
        ls_s, lu_s = ops.loss_terms(g, w, rs_s, ru_s)
        ls_f, lu_f = loss_forward_fused_packed(g, w, packed)
        return (
            rel,
            mx,
            jnp.abs(ls_f - ls_s) / jnp.abs(ls_s),
            jnp.abs(lu_f - lu_s) / jnp.abs(lu_s),
        )

    rel, mx, lsr, lur = [float(x) for x in errs(fs, packed)]
    return {
        "resid_rel": rel,
        "resid_max_scaled": mx,
        "loss_sigma_rel": lsr,
        "loss_u_rel": lur,
    }


def big_phys_rows(g: GridSpec, iters: int = 10) -> list:
    """Timing rows for the fused residual kernel family at a big grid
    (f32 packed + bf16-I/O packed — the arms that define the headline and
    its mixed-precision tier). Inputs are drawn on device."""
    from phys_autodiff_tpu.pallas.residuals import (
        pack_fields,
        residuals_fused_packed,
        residuals_fused_packed_bf16,
    )

    assert g.nx % 128 == 0, "big grids use the packed one-DMA kernel"
    fs = device_random_fields(g)
    packed = jax.block_until_ready(pack_fields(fs))
    ms = time_packed_op(lambda p: residuals_fused_packed(g, p), packed)
    rows = [PhysRow("fused", g.nx, g.ny, g.nz, iters, ms)]
    packed_bf16 = jax.block_until_ready(packed.astype(jnp.bfloat16))
    ms_b = time_packed_op(
        lambda p: residuals_fused_packed_bf16(g, p), packed_bf16
    )
    rows.append(PhysRow("fused_bf16io", g.nx, g.ny, g.nz, iters, ms_b))
    return rows


def big_loss_ms(g: GridSpec) -> float:
    """ms/iter of the fused loss forward (in-kernel reduction) at a big
    grid."""
    from phys_autodiff_tpu.pallas.residuals import (
        loss_forward_fused_packed,
        pack_fields,
    )

    w = PhysWeights()
    packed = jax.block_until_ready(pack_fields(device_random_fields(g)))
    return time_packed_op(lambda p: loss_forward_fused_packed(g, w, p), packed)


def big_train_ms(g: GridSpec, h: int = 128, variants=("fused", "fused_bf16")):
    """ms/step of the fused training step at a big grid: mega forward +
    the slab-recompute backward (mega_fits routes deep-z grids there — its
    dCD accumulator cannot stay VMEM-resident past nz ~ 500). The staged
    arm is structurally excluded: its jax.grad backward retains a [3N, H]
    activation residual (~25.8 GB at 256^3, H=128) that cannot fit HBM."""
    from phys_autodiff_tpu.bench.trainbench import bench_train_step

    return bench_train_step(g, h=h, variants=variants)
