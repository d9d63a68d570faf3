"""Failure detection + auto-resume for long training runs.

SURVEY.md §5 lists "failure detection / elastic recovery" as absent from
the reference and scoped it to "restartable benchmark scripts" for this
framework; this module builds the real thing for training, motivated by an
empirically real failure mode: the tunneled single-chip TPU worker crashes
or restarts mid-run (it killed the round-2 driver benchmark — VERDICT.md
"What's missing" #1 — and wedged twice during round 3's hardware campaign,
docs/ROUND3.md). A multi-hour training job should not lose its run to one
worker hiccup.

Design (TPU realities drive all three choices):

  * Checkpoint-every-K with atomic single-file .npz (train/checkpoint.py):
    a crash can never leave a half-written or manifest-skewed file, so the
    newest checkpoint is always loadable.
  * On failure the jitted step is REBUILT via a user factory: a crashed
    worker invalidates compiled executables and live buffers; re-tracing
    against the recovered backend is the only safe resume. Stale device
    arrays in the saved TrainState are immaterial — checkpoints restore
    from host-side npz into fresh buffers.
  * Failures are detected by exception class + message predicate, default-
    tuned to the JAX runtime errors a dying worker raises (XlaRuntimeError
    and friends); programming errors (shape mismatches, etc.) re-raise
    immediately rather than burning restarts.

No reference analogue (nothing distributed or restartable exists there);
the elastic-recovery checklist row this fills is SURVEY §5 "Failure
detection".
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax

from phys_autodiff_tpu.train import checkpoint


def default_failure_predicate(exc: Exception) -> bool:
    """True for exceptions that look like infrastructure failures (worker
    crash/restart, connection loss) rather than programming errors.

    JAX surfaces dead-backend conditions as XlaRuntimeError (grpc UNAVAILABLE
    / INTERNAL, "TPU worker", "socket closed", ...). Shape/type/trace errors
    arrive as TypeError/ValueError and must NOT be retried."""
    name = type(exc).__name__
    if name in ("XlaRuntimeError", "JaxRuntimeError", "RuntimeError"):
        return True
    msg = str(exc).lower()
    return any(
        s in msg
        for s in ("unavailable", "worker", "socket", "connection",
                  "deadline", "internal error")
    )


@dataclasses.dataclass(frozen=True)
class ResilienceConfig:
    ckpt_path: str  # checkpoint file (".npz" appended if missing)
    save_every: int = 50  # optimizer steps between checkpoints
    max_restarts: int = 3  # give up after this many failures
    backoff_s: float = 0.0  # wait before a retry (worker recovery time)
    is_failure: Callable[[Exception], bool] = default_failure_predicate
    meta: dict | None = None  # embedded in every checkpoint (e.g.
    # ngp.checkpoint_meta(cfg)) and validated on resume


@dataclasses.dataclass
class RunReport:
    steps_done: int = 0
    failures: int = 0
    restores: int = 0
    checkpoints: int = 0


def _to_host(state: Any) -> Any:
    """Device -> host copy so the checkpoint write cannot itself die on a
    crashed worker holding the buffers."""
    return jax.tree.map(lambda x: jax.device_get(x), state)


def fit_resilient(
    step_factory: Callable[[], Callable[[Any], tuple[Any, Any]]],
    state0: Any,
    steps: int,
    rcfg: ResilienceConfig,
    log: Callable[[int, float], None] | None = None,
):
    """Run `steps` optimizer steps with checkpoint/auto-resume.

    step_factory() -> jitted `step(state) -> (state, loss)`; it is called
    once up front and called AGAIN after every detected failure (rebuilding
    the executable against the recovered backend). state0 is the initial
    TrainState-like pytree; its structure defines the checkpoint format.

    Semantics on failure: training resumes from the LAST CHECKPOINT (work
    since then is re-done — at-least-once step execution). Deterministic
    steps therefore converge to the same trajectory; stochastic t-sampling
    replays the same PRNG stream because the key lives in the state.

    Returns (final_state, history, report); history holds (step, loss)
    pairs at every checkpoint boundary."""
    if steps <= 0:
        return state0, [], RunReport()
    save_every = max(1, rcfg.save_every)
    step = step_factory()
    state = state0
    # step counter comes from the state when it has one (TrainState.step),
    # else we track locally
    def step_no(s, fallback):
        n = getattr(s, "step", None)
        if n is None:
            return fallback
        return int(jax.device_get(n))

    report = RunReport()
    history: list[tuple[int, float]] = []
    done = 0
    # initial checkpoint so the first failure has something to resume from
    checkpoint.save_npz(rcfg.ckpt_path, _to_host(state), meta=rcfg.meta)
    report.checkpoints += 1
    while done < steps:
        burst = min(save_every, steps - done)
        try:
            for _ in range(burst):
                state, loss = step(state)
            # materialize the loss: device errors surface at fetch time
            loss_f = float(jax.device_get(loss))
        except Exception as exc:  # noqa: BLE001 — filtered by predicate
            if not rcfg.is_failure(exc):
                raise
            report.failures += 1
            if report.failures > rcfg.max_restarts:
                raise RuntimeError(
                    f"giving up after {report.failures - 1} restarts "
                    f"(max_restarts={rcfg.max_restarts})"
                ) from exc
            if rcfg.backoff_s:
                time.sleep(rcfg.backoff_s)
            # resume: reload last checkpoint, rebuild the executable
            state = checkpoint.restore_npz(
                rcfg.ckpt_path, state0, expect_meta=rcfg.meta
            )
            step = step_factory()
            report.restores += 1
            done = max(0, step_no(state, done) - step_no(state0, 0))
            continue
        done += burst
        checkpoint.save_npz(rcfg.ckpt_path, _to_host(state), meta=rcfg.meta)
        report.checkpoints += 1
        history.append((step_no(state, done), loss_f))
        if log:
            log(step_no(state, done), loss_f)
    report.steps_done = done
    return state, history, report
