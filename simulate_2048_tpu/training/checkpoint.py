"""Orbax checkpointing with full train-state round-trip.

Counterpart of the reference's ``CheckpointManager``
(``reinforce/training/learner.py:330-485``) with its restore gap fixed: the
reference drops the saved optimizer state and re-initializes Adam moments on
resume (``learner.py:467-471``); here ``opt_state`` round-trips exactly, so
resumed runs are bitwise-continuations.
"""

from __future__ import annotations

import dataclasses
import json
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

    def save_config(self, config: Any) -> None:
        """Persist the TrainConfig as a JSON sidecar (``train_config.json``).

        The reference stores its config inside the orbax payload
        (``learner.py:382-388``); a JSON sidecar is equally durable and lets
        tools (eval CLI, sweep scripts) rebuild the EXACT training config —
        including model-shape fields like ``value_bins`` — without guessing
        which preset/overrides produced the checkpoint.
        """
        path = os.path.join(self.directory, "train_config.json")
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=1, default=str)

    def load_config_dict(self) -> dict[str, Any] | None:
        """The saved config as a plain dict (JSON types), or None if absent.

        Use :func:`load_train_config` to rebuild a ``TrainConfig``.
        """
        path = os.path.join(self.directory, "train_config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_step(self) -> int | None:
        """Most recent saved step (``learner.py:481-485``)."""
        return self._manager.latest_step()

    def all_steps(self) -> list[int]:
        """Every step with a saved checkpoint (for ``--step`` validation)."""
        return list(self._manager.all_steps())

    def close(self) -> None:
        self._manager.close()


def load_train_config(checkpoint_dir: str):
    """Rebuild the ``TrainConfig`` a checkpoint was trained with, or None.

    Reads the ``train_config.json`` sidecar written by
    :meth:`CheckpointManager.save_config`, restoring JSON lists to the
    tuple-typed fields (``temperature_schedule``). Unknown keys (from a
    newer/older config schema) are dropped with a warning rather than
    failing, so old checkpoints stay loadable.
    """
    import warnings

    from simulate_2048_tpu.training.config import TrainConfig

    mgr_dir = os.path.abspath(checkpoint_dir)
    path = os.path.join(mgr_dir, "train_config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    if "temperature_schedule" in raw:
        raw["temperature_schedule"] = tuple(
            (int(s), float(t)) for s, t in raw["temperature_schedule"]
        )
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    unknown = set(raw) - known
    if unknown:
        warnings.warn(f"train_config.json: dropping unknown fields {sorted(unknown)}")
        raw = {k: v for k, v in raw.items() if k in known}
    return TrainConfig(**raw)
