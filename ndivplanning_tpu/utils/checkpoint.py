"""Checkpoint / resume via orbax (SURVEY.md §5).

The full :class:`TrainState` pytree — params, optimizer states, PRNG key,
step counter — is saved atomically, so a restored run continues the exact
bitwise loss curve (the determinism target applied across restarts;
tests/test_checkpoint.py proves it with a kill/resume simulation).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


def _manager(workdir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    path = os.path.join(os.path.abspath(workdir), "checkpoints")
    return ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
    )


def save_checkpoint(workdir: str, state, step: int | None = None) -> None:
    """Atomic save of the train-state pytree at ``step``."""
    mgr = _manager(workdir)
    step = int(state.step) if step is None else int(step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_latest(workdir: str, state_template):
    """Restore the newest checkpoint into ``state_template``'s structure.

    Returns the restored state, or None if no checkpoint exists.
    """
    mgr = _manager(workdir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(state_template)
    )
    mgr.close()
    return restored


def latest_step(workdir: str) -> int | None:
    mgr = _manager(workdir)
    step = mgr.latest_step()
    mgr.close()
    return step
