"""Full train-state checkpoint / resume via Orbax.

The reference checkpoints model weights only, acknowledging the gap
("todo optimizer states", ``configs/trainer.yaml:11``) — a crash loses the
optimizer and schedule. Here the whole train state (step, params, opt_state)
round-trips, enabling true mid-run resume (SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_train_state(directory: str, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()


def restore_train_state(directory: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target``; latest step if
    ``step`` is None. Returns (step, state)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"No checkpoints in {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(jax.device_get(target)))
    return step, restored
