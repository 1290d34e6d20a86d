"""Failure detection + checkpoint-restart training harness (SURVEY §5.3).

The reference has no failure story at all — a crash loses the run, and
several latent crash bugs exist (SURVEY §5-notes). Full elasticity
(reconfiguring the device mesh around lost hosts) is out of scope for
parity (SURVEY §5.3); what production training does need is covered
here:

- **failure detection**: every step's loss is checked for finiteness
  (NaN/Inf — divergence, bad batch, silent data corruption) and the
  dispatch is guarded against runtime errors (device resets, OOM,
  preemption surfacing as XLA errors);
- **checkpoint-restart**: periodic orbax checkpoints of the full
  training payload; on failure the harness restores the latest good
  checkpoint and resumes from the following batch — bounded retries
  prevent crash loops;
- **fault injection**: the ``inject_fault`` hook lets tests (and chaos
  drills) force a failure at a chosen step; recovery is asserted in
  ``tests/test_training.py``.

Usage::

    runner = ResilientRunner(ckpt_dir, checkpoint_every=50)
    state = runner.run(step_fn, state, batches)

``step_fn(state, batch) -> (state, loss)`` must be a pure jitted step —
restoring a checkpoint and re-running later batches is then exactly the
computation an uninterrupted run would have done from that point.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Iterable, Optional, Tuple

from mma_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


@dataclasses.dataclass
class FailureRecord:
    step: int
    kind: str  # "nonfinite-loss" | "exception" | "injected"
    detail: str
    restored_step: Optional[int]


@dataclasses.dataclass
class ResilientRunner:
    """Checkpoint-restart step loop with failure detection.

    ``checkpoint_every``: save the payload every N successful steps
    (step 0 is always saved so a first-step failure can restore).
    ``max_restarts``: total failures tolerated before re-raising —
    a crash loop (e.g. a deterministic NaN) should fail loudly, not
    spin forever.
    """

    ckpt_dir: str
    checkpoint_every: int = 50
    max_restarts: int = 3
    inject_fault: Optional[Callable[[int], Optional[str]]] = None

    def __post_init__(self):
        self.failures = []  # FailureRecord log, inspectable after run

    def _detect(self, step: int, loss) -> Optional[str]:
        if self.inject_fault is not None:
            kind = self.inject_fault(step)
            if kind:
                return kind
        if loss is not None and not math.isfinite(float(loss)):
            return "nonfinite-loss"
        return None

    def run(
        self,
        step_fn: Callable[[Any, Any], Tuple[Any, Any]],
        state: Any,
        batches: Iterable[Any],
        *,
        resume: bool = True,
    ) -> Any:
        """Drive ``step_fn`` over ``batches`` with detection + restart.

        ``batches`` must be re-iterable indexable (list/tuple): restart
        resumes from the batch AFTER the restored checkpoint's step.
        Returns the final state.
        """
        # Checkpoint key invariant: key N = state after N COMPLETED
        # steps (key 0 = the initial state, always saved so a
        # first-step failure can restore).
        batches = list(batches)
        completed = 0
        if resume:
            prev = latest_step(self.ckpt_dir)
            if prev is not None:
                _, state = restore_checkpoint(
                    self.ckpt_dir, prev, target=state
                )
                completed = prev
        if completed == 0:
            save_checkpoint(self.ckpt_dir, 0, state)
        good = completed

        restarts = 0
        fail_counts = {}
        skip = set()
        while completed < len(batches):
            i = completed
            if i in skip:
                completed += 1
                continue
            failure = None
            try:
                new_state, loss = step_fn(state, batches[i])
                failure = self._detect(i, loss)
            except Exception as e:  # runtime/dispatch errors
                failure = f"exception: {type(e).__name__}: {e}"
            if failure is None:
                state = new_state
                completed += 1
                if (self.checkpoint_every > 0
                        and completed % self.checkpoint_every == 0):
                    save_checkpoint(self.ckpt_dir, completed, state)
                    good = completed
                continue

            restarts += 1
            self.failures.append(FailureRecord(
                step=i, kind=failure.split(":")[0], detail=failure,
                restored_step=good,
            ))
            if restarts > self.max_restarts:
                raise RuntimeError(
                    f"step {i}: {failure} — exceeded max_restarts="
                    f"{self.max_restarts} (crash loop); last good "
                    f"checkpoint: {good} completed steps in "
                    f"{self.ckpt_dir}"
                )
            # Restore the last good payload and REPLAY from there —
            # steps are pure, so the replay reproduces the
            # uninterrupted computation. A transient fault gets one
            # retry of its batch; a batch that fails twice (a
            # deterministically bad batch — the reference's latent
            # crash inputs, SURVEY §5-notes) is skipped.
            fail_counts[i] = fail_counts.get(i, 0) + 1
            if fail_counts[i] >= 2:
                skip.add(i)
            _, state = restore_checkpoint(self.ckpt_dir, good, target=state)
            completed = good
        save_checkpoint(self.ckpt_dir, len(batches), state)
        return state
