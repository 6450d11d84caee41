"""Orbax checkpointing with full train-state round-trip.

Counterpart of the reference's ``CheckpointManager``
(``reinforce/training/learner.py:330-485``) with its restore gap fixed: the
reference drops the saved optimizer state and re-initializes Adam moments on
resume (``learner.py:467-471``); here ``opt_state`` round-trips exactly, so
resumed runs are bitwise-continuations.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from simulate_2048_tpu.models.network import NetworkParams
from simulate_2048_tpu.training.learner import TrainState

Array = jax.Array


class CheckpointManager:
    """Thin orbax wrapper: save/restore {params, opt_state, step}."""

    def __init__(self, checkpoint_dir: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(
        self, state: TrainState, step: int | None = None, buffer=None, runtime=None
    ) -> None:
        """Persist the full train state (``learner.py:370-393``).

        Pass ``buffer`` (a replay ``BufferState``) to checkpoint experience
        too — the reference never persists its buffer (SURVEY.md §5.4), so a
        resumed reference run restarts from an empty one. ``runtime`` is an
        optional small pytree-dict of trainer-loop state (carried self-play
        env state, cross-segment-backfill bookkeeping) so a resume continues
        the in-flight games instead of silently dropping them (VERDICT r2 #7).
        """
        step = int(state.step) if step is None else step
        payload = {
            "params": state.params._asdict(),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "step": step,
        }
        items = {"state": ocp.args.StandardSave(payload)}
        if buffer is not None:
            items["buffer"] = ocp.args.StandardSave(jax.tree.map(np.asarray, buffer._asdict()))
        if runtime is not None:
            items["runtime"] = ocp.args.StandardSave(jax.tree.map(np.asarray, runtime))
        self._manager.save(step, args=ocp.args.Composite(**items))
        self._manager.wait_until_finished()

    def restore_runtime(self, template: dict, step: int | None = None):
        """Restore the trainer-runtime payload; None if absent (old ckpts)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        try:
            restored = self._manager.restore(
                step,
                args=ocp.args.Composite(runtime=ocp.args.StandardRestore(template)),
            )
        except (KeyError, ValueError, FileNotFoundError):
            return None
        return restored["runtime"]

    def restore_buffer(self, template, step: int | None = None):
        """Restore a checkpointed replay buffer; None if absent."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        try:
            restored = self._manager.restore(
                step,
                args=ocp.args.Composite(
                    buffer=ocp.args.StandardRestore(template._asdict())
                ),
            )
        except (KeyError, ValueError, FileNotFoundError):
            return None
        return type(template)(**restored["buffer"])

    def restore(self, template: TrainState, step: int | None = None) -> TrainState | None:
        """Restore into the shapes/dtypes of ``template``; None if empty.

        Unlike ``learner.py:418-479`` the optimizer state is restored, not
        re-initialized.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        template_payload = {
            "params": template.params._asdict(),
            "opt_state": template.opt_state,
            "step": int(template.step),
        }
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template_payload)),
        )["state"]
        return TrainState(
            params=NetworkParams(**restored["params"]),
            opt_state=jax.tree.map(
                lambda t, r: jax.numpy.asarray(r, dtype=t.dtype) if hasattr(t, "dtype") else r,
                template.opt_state,
                restored["opt_state"],
            ),
            step=jax.numpy.int32(restored["step"]),
        )

    def latest_step(self) -> int | None:
        """Most recent saved step (``learner.py:481-485``)."""
        return self._manager.latest_step()

    def close(self) -> None:
        self._manager.close()
