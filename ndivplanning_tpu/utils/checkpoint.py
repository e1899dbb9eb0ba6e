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


def save_checkpoint(workdir: str, state, step: int | None = None,
                    overwrite: bool = False) -> None:
    """Atomic save of the train-state pytree at ``step``.

    ``overwrite=True`` deletes an existing checkpoint at the same step
    first: orbax otherwise SILENTLY skips the save, which would leave a
    freshly-written side marker (best_path.json) pointing at stale
    weights when a resumed run re-reaches a step already present in
    <workdir>/best (ADVICE round 2).
    """
    mgr = _manager(workdir)
    step = int(state.step) if step is None else int(step)
    if overwrite and step in mgr.all_steps():
        mgr.delete(step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_latest(workdir: str, state_template):
    """Restore the newest checkpoint into ``state_template``'s structure.

    Returns the restored state, or None if no checkpoint exists.

    Migration: checkpoints written before ``TrainState.g_ema_params``
    existed restore with the EMA slot initialised from the restored
    ``g_params`` (a fresh copy — the donated step must not see aliased
    buffers), instead of failing on the tree-structure mismatch.
    """
    mgr = _manager(workdir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    try:
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
    except ValueError:
        try:
            restored = _restore_legacy(mgr, step, state_template)
        except ValueError as e:
            mgr.close()
            raise ValueError(
                f"checkpoint in {workdir!r} does not match the current "
                "config's TrainState schema (e.g. a different "
                "lr_schedule changes the optimizer state structure). "
                "Pass the config that trained it — the CLI picks up "
                "<workdir>/config.json automatically when present."
            ) from e
    mgr.close()
    return restored


def _restore_legacy(mgr, step: int, state_template):
    """Restore an older-schema checkpoint into the current TrainState.

    Three legacy generations, tried newest-first:

    - pre-``ada`` (rounds 2-3, including the shipped family
      checkpoints): the ADA controller state is missing — restored as
      zeros (augmentation off, the controller's own cold start).
    - pre-``lecam_ema`` (mid round 3): the LeCam trackers are missing —
      restored as zeros.  (If such a run resumes WITH lecam newly
      enabled, the anchors re-warm over ~1/(1-decay) steps: the bias
      correction keys on the global step, which restores large.)
    - pre-``g_ema_params`` (round 2): additionally missing the EMA slot
      — restored as a fresh copy of the restored ``g_params`` (a copy,
      not an alias: the donated step rejects twice-donated buffers).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.train.state import fresh_ada, fresh_lecam_ema

    def _template_without(missing):
        return {f.name: getattr(state_template, f.name)
                for f in dataclasses.fields(state_template)
                if f.name not in missing}

    fresh = {"ada": fresh_ada()}
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(
            _template_without(("ada",))))
        return dataclasses.replace(state_template, **restored, **fresh)
    except ValueError:
        pass
    fresh["lecam_ema"] = fresh_lecam_ema()
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(
            _template_without(("ada", "lecam_ema"))))
        return dataclasses.replace(state_template, **restored, **fresh)
    except ValueError:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(
            _template_without(("ada", "lecam_ema", "g_ema_params"))))
        return dataclasses.replace(
            state_template,
            **restored,
            g_ema_params=jax.tree.map(jnp.copy, restored["g_params"]),
            **fresh,
        )


def latest_step(workdir: str) -> int | None:
    mgr = _manager(workdir)
    step = mgr.latest_step()
    mgr.close()
    return step
