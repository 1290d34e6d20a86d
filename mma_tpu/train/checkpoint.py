"""Checkpoint/resume via orbax (SURVEY §5.4 — the reference has none;
training always restarts from scratch there).

Saves the full training payload (params, optimizer state, model state,
epoch cursor, scheduler state) so multi-host benches can restart from the
latest step.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:08d}")


def save_checkpoint(directory: str, step: int, payload: Any) -> str:
    os.makedirs(directory, exist_ok=True)
    path = _ckpt_path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except (IndexError, ValueError):
                continue
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None, target: Any = None):
    """Restore ``step`` (default latest). ``target`` provides the pytree
    structure/shapes; pass an example payload (its values are unused)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None, None
    path = _ckpt_path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            import jax

            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            payload = ckptr.restore(path, abstract)
        else:
            payload = ckptr.restore(path)
    return step, payload
