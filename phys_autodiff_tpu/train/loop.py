"""The closed training loop: MLP weights optimized against the physics loss.

The reference planned this as Goal B / milestone M6 (REQUIREMENT.md:11,
155-169: "physics-only training", loss must drop >= 90% in K steps) but never
built it — its MLP backward hard-codes an MSE-vs-target head with no way to
inject the physics VJP (src/mlp_cuda.cu:123-184, survey §3.5). Here the whole
chain MLP -> fields -> residuals -> loss is differentiable, so the loop is
one jax.value_and_grad plus an optax update, jitted end to end.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from phys_autodiff_tpu import ops
from phys_autodiff_tpu.models import fields as fields_mod
from phys_autodiff_tpu.models import mlp
from phys_autodiff_tpu.utils.config import GridSpec, MLPGridConfig, PhysWeights


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    steps: int = 200
    learning_rate: float = 1e-3
    optimizer: str = "adam"  # "adam" | "adamw" | "sgd"
    weight_decay: float = 0.0  # decoupled weight decay (optimizer="adamw")
    grad_clip: float = 0.0  # global-norm gradient clip; 0 disables
    lr_schedule: str = "constant"  # "constant" | "cosine" (warmup ->
    # cosine decay to lr_final_scale * learning_rate over cfg.steps)
    warmup_steps: int = 0  # linear warmup from 0 (schedules only)
    lr_final_scale: float = 0.0  # cosine floor as a fraction of peak lr
    t: float = 0.25  # snapshot time ("fixed") or sampling base
    t_sampling: str = "fixed"  # "fixed" | "uniform" (t ~ U(0,1) per step)
    seed: int = 0
    log_every: int = 10
    use_fused: bool = False  # fused step: forward = packed Pallas
    # MLP->residual->loss pipeline, backward = slab-blocked recompute
    # gradient (train/slab_grad.py) — fields, residuals and the [3N, H]
    # activation residual never materialize at grid size
    precision: str = "f32"  # "f32" | "bf16" — fused-step compute precision
    remat: bool = False  # rematerialize field generation in the backward
    # (drops the [N, H] hidden-activation residual from HBM; trades ~1
    # forward recompute for memory headroom on large grids)
    matmul_precision: str | None = None  # None (module defaults) |
    # "bfloat16" | "tensorfloat32" | "float32": jax.default_matmul_precision
    # for the whole step. NOTE: the coordinate MLP pins its own matmuls to
    # HIGHEST for the parity doctrine, so this only affects unpinned matmuls
    # (e.g. the NGP head or custom generators); the fast-gradient path for
    # the core model is the round-2 fused backward (docs/DESIGN.md).


class TrainState(NamedTuple):
    params: mlp.Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    key: jnp.ndarray


def make_schedule(cfg: TrainConfig):
    """Learning-rate schedule per cfg: a float (constant) or an optax
    schedule callable (warmup -> cosine decay over cfg.steps)."""
    if cfg.lr_schedule == "constant":
        if cfg.warmup_steps > 0:
            return optax.linear_schedule(
                0.0, cfg.learning_rate, cfg.warmup_steps
            )
        return cfg.learning_rate
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.steps, cfg.warmup_steps + 1),
            end_value=cfg.lr_final_scale * cfg.learning_rate,
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Optimizer chain: optional global-norm clip -> adam/adamw/sgd under
    the configured schedule. Everything is optax-standard so the state
    checkpoints through train/checkpoint.py unchanged (pure pytrees)."""
    lr = make_schedule(cfg)
    if cfg.optimizer == "adam":
        core = optax.adam(lr)
    elif cfg.optimizer == "adamw":
        core = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        core = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip > 0.0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), core)
    return core


def init_state(
    cfg: TrainConfig, mcfg: MLPGridConfig, seed: int | None = None
) -> TrainState:
    seed = cfg.seed if seed is None else seed
    params = mlp.init_params(mcfg.dims, seed=seed)
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.int32(0),
        # the PRNG stream follows the same seed override as the params, so
        # multi-seed runs are independent in BOTH init and t-sampling
        key=jax.random.PRNGKey(seed),
    )


def loss_fn(
    g: GridSpec,
    w: PhysWeights,
    mcfg: MLPGridConfig,
    params: mlp.Params,
    t,
    use_fused: bool = False,
    remat: bool = False,
    precision: str = "f32",
):
    """Scalar physics loss of the MLP-generated fields at time t.

    use_fused=True routes the WHOLE loss through the fused path: forward is
    the packed Pallas MLP->residual->loss pipeline, backward the
    slab-blocked recompute gradient (train/slab_grad.py) — the round-2 fused
    training step (remat is implicit: nothing grid-sized is retained)."""
    if use_fused:
        from phys_autodiff_tpu.train.slab_grad import make_fused_loss

        return make_fused_loss(g, w, mcfg, precision)(params, jnp.float32(t))
    gen = lambda p, tt: fields_mod.generate_fields(g, mcfg, p, tt, g.dt)
    if remat:
        gen = jax.checkpoint(gen)
    fs = gen(params, t)
    return ops.total_loss(g, w, fs)


def make_train_step(
    g: GridSpec, w: PhysWeights, mcfg: MLPGridConfig, cfg: TrainConfig
) -> Callable[[TrainState], tuple[TrainState, jnp.ndarray]]:
    """Returns the jitted (state) -> (state', loss) step."""
    return jax.jit(_make_step_fn(g, w, mcfg, cfg))


def make_train_epoch(
    g: GridSpec,
    w: PhysWeights,
    mcfg: MLPGridConfig,
    cfg: TrainConfig,
    steps_per_call: int,
):
    """Scan-based multi-step trainer: runs `steps_per_call` optimizer steps
    inside ONE jitted program (lax.scan), returning the per-step loss trace.

    This is the production shape of the loop — one dispatch per epoch rather
    than per step — and on dispatch-latency-bound setups it is orders of
    magnitude faster wall-clock than the step-at-a-time loop.
    """
    step = _make_step_fn(g, w, mcfg, cfg)

    @jax.jit
    def epoch(state: TrainState):
        def body(state, _):
            state, loss = step(state)
            return state, loss

        return jax.lax.scan(body, state, None, length=steps_per_call)

    return epoch


def _make_step_fn(g, w, mcfg, cfg):
    """Unjitted single step (shared by make_train_step and make_train_epoch)."""
    opt = make_optimizer(cfg)
    # Fused step on supported configs: ONE kernel computes the loss AND all
    # parameter gradients (pallas/mega_bwd.py); otherwise value_and_grad of
    # the (possibly fused-forward) loss.
    from phys_autodiff_tpu.pallas.mega_bwd import mega_fits, mega_supported

    # mega_fits: the mega backward's dCD accumulator is VMEM-resident across
    # the z sweep, so deep-z grids overflow VMEM — those route to the
    # slab-recompute gradient via loss_fn's fused path (make_fused_loss
    # applies the same gate and picks backward="slab").
    use_mega_bwd = (
        cfg.use_fused and mega_supported(g) and mega_fits(g, mcfg.dims.H)
    )

    def step(state: TrainState):
        key, sub = jax.random.split(state.key)
        if cfg.t_sampling == "uniform":
            t = jax.random.uniform(sub, ())
        else:
            t = jnp.float32(cfg.t)
        if use_mega_bwd:
            from phys_autodiff_tpu.pallas.mega_bwd import mega_loss_and_grad

            loss, (grads, _) = mega_loss_and_grad(
                g, w, mcfg, state.params, t, cfg.precision
            )
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(
                    g, w, mcfg, p, t, cfg.use_fused, cfg.remat, cfg.precision
                )
            )(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, key), loss

    if cfg.matmul_precision is not None:
        inner = step

        def step(state):
            with jax.default_matmul_precision(cfg.matmul_precision):
                return inner(state)

    return step


def fit(
    g: GridSpec,
    w: PhysWeights,
    mcfg: MLPGridConfig,
    cfg: TrainConfig,
    state: TrainState | None = None,
    callback: Callable[[int, float], None] | None = None,
):
    """Run the loop; returns (final_state, history, elapsed_seconds) where
    history is a list of (step, loss) pairs sampled every cfg.log_every
    steps (plus the final step).

    The reference's acceptance criterion (REQUIREMENT.md:164-169): the loss
    should drop >= 90% within the configured number of steps.
    """
    if state is None:
        state = init_state(cfg, mcfg)
    step = make_train_step(g, w, mcfg, cfg)
    history = []
    t0 = time.perf_counter()
    for i in range(cfg.steps):
        state, loss = step(state)
        if i % cfg.log_every == 0 or i == cfg.steps - 1:
            loss_f = float(loss)
            history.append((int(state.step), loss_f))
            if callback:
                callback(int(state.step), loss_f)
    elapsed = time.perf_counter() - t0
    return state, history, elapsed


def fit_scan(
    g: GridSpec,
    w: PhysWeights,
    mcfg: MLPGridConfig,
    cfg: TrainConfig,
    state: TrainState | None = None,
    callback: Callable[[int, float], None] | None = None,
    steps_per_call: int | None = None,
):
    """Like fit(), but runs the loop on-device with lax.scan: one dispatch
    per `steps_per_call` steps (default: log_every). Returns the same
    (state, history, elapsed); history holds one (step, loss) pair per
    chunk — the LAST loss of each scan call, not a per-step trace."""
    if state is None:
        state = init_state(cfg, mcfg)
    chunk = steps_per_call or max(1, cfg.log_every)
    epoch = make_train_epoch(g, w, mcfg, cfg, chunk)
    history = []
    t0 = time.perf_counter()
    done = 0
    while done < cfg.steps:
        # Size the last call to the remainder so exactly cfg.steps optimizer
        # steps run (a second scan program is compiled only when needed).
        this = min(chunk, cfg.steps - done)
        if this != chunk:
            epoch = make_train_epoch(g, w, mcfg, cfg, this)
        state, losses = epoch(state)
        done += this
        loss_f = float(losses[-1])
        history.append((int(state.step), loss_f))
        if callback:
            callback(int(state.step), loss_f)
    elapsed = time.perf_counter() - t0
    return state, history, elapsed


def make_ngp_train_step(
    g: GridSpec,
    w: PhysWeights,
    ncfg,
    cfg: TrainConfig,
    params0: dict,
    precision: str = "f32",
    backward: str = "auto",
):
    """Training step for the NGP hash-encoded field model.

    backward="mega" runs the NGP backward mega-kernel (ONE Pallas pass for
    loss + head gradients + the encoding cotangent, pallas/mega_ngp.py —
    the H-space activations never touch HBM) plus the scatter-free encoder
    VJP; "xla" takes jax.value_and_grad through the XLA pipeline with the
    fused physics loss (the round-3-early path); "auto" picks mega on real
    accelerators whenever the plane is supported."""
    from phys_autodiff_tpu.models import ngp as ngp_mod
    from phys_autodiff_tpu.pallas.mega_ngp import (
        ngp_loss_and_grad,
        ngp_supported,
    )

    if backward == "auto":
        backward = (
            "mega"
            if ngp_supported(g) and jax.default_backend() != "cpu"
            else "xla"
        )
    if backward == "xla":
        return make_generic_train_step(
            g,
            w,
            lambda p, t: ngp_mod.generate_fields(g, ncfg, p, t, g.dt,
                                                 precision),
            cfg,
            params0,
            generate_packed_fn=lambda p, t: ngp_mod.generate_fields_packed(
                g, ncfg, p, t, g.dt, precision
            ),
        )
    opt = make_optimizer(cfg)

    def step(state: TrainState):
        key, sub = jax.random.split(state.key)
        if cfg.t_sampling == "uniform":
            t = jax.random.uniform(sub, ())
        else:
            t = jnp.float32(cfg.t)
        loss, (grads, _) = ngp_loss_and_grad(
            g, w, ncfg, state.params, t, precision
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, key), loss

    state0 = TrainState(
        params=params0,
        opt_state=opt.init(params0),
        step=jnp.int32(0),
        key=jax.random.PRNGKey(cfg.seed),
    )
    return jax.jit(step), state0


def make_generic_train_step(
    g: GridSpec,
    w: PhysWeights,
    generate_fn,
    cfg: TrainConfig,
    params0,
    physics_loss: str = "auto",
    generate_packed_fn=None,
):
    """Model-agnostic training step for any differentiable field generator
    `generate_fn(params, t) -> FieldSnapshots` (plain MLP, fused-MLP, NGP
    hash field, ...). Returns (jitted_step, initial TrainState).

    physics_loss: "staged" runs the XLA residual chain; "fused" runs the
    in-kernel-reduction Pallas loss (differentiable — its custom_vjp is the
    exact field adjoint; loss_forward_fused_packed falls back to staged ops
    itself on planes no fused kernel serves). "auto" picks fused on real
    accelerators and staged on the CPU backend (where Pallas would run in
    slow interpret mode).

    generate_packed_fn: optional `(params, t) -> [12, nz, ny, nx]` producing
    the packed field block DIRECTLY (residuals.PACKED_ORDER). When given,
    the fused branch uses it instead of pack_fields(generate_fn(...)),
    skipping the channels-last -> plane relayout (and its transposed replay
    in the backward) for generators that can emit channel-first (e.g.
    ngp.generate_fields_packed)."""
    opt = make_optimizer(cfg)
    if physics_loss == "auto":
        physics_loss = "fused" if jax.default_backend() != "cpu" else "staged"

    if physics_loss == "fused":
        from phys_autodiff_tpu.pallas.residuals import (
            loss_forward_fused_packed,
            pack_fields,
        )

        if generate_packed_fn is not None:

            def total_loss_of(p, t):
                ls, lu = loss_forward_fused_packed(g, w, generate_packed_fn(p, t))
                return ls + lu
        else:

            def total_loss_of(p, t):
                ls, lu = loss_forward_fused_packed(
                    g, w, pack_fields(generate_fn(p, t))
                )
                return ls + lu
    else:

        def total_loss_of(p, t):
            return ops.total_loss(g, w, generate_fn(p, t))

    def step(state: TrainState):
        key, sub = jax.random.split(state.key)
        if cfg.t_sampling == "uniform":
            t = jax.random.uniform(sub, ())
        else:
            t = jnp.float32(cfg.t)

        loss, grads = jax.value_and_grad(lambda p: total_loss_of(p, t))(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, key), loss

    state0 = TrainState(
        params=params0,
        opt_state=opt.init(params0),
        step=jnp.int32(0),
        key=jax.random.PRNGKey(cfg.seed),
    )
    return jax.jit(step), state0
