"""Fully on-device rollout drivers.

The reference's self-play outer loop is host Python with a device sync per
move (``self_play.py:96,314``; ``np.array`` copies at ``:345-349``). Here the
whole rollout — action choice, env step, bookkeeping — is one
``lax.scan`` under jit: zero host round-trips, batch in vector lanes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simulate_2048_tpu.env import env as envlib
from simulate_2048_tpu.ops import board as ops

Array = jax.Array


class RolloutStats(NamedTuple):
    """Aggregates from an auto-reset rollout."""

    episodes_finished: Array  # int32 — episodes completed across the batch
    total_reward: Array  # float32 — sum of rewards over all steps/envs
    max_tile: Array  # int32 — best tile seen in any env
    steps: Array  # int32 — env-steps executed (batch * length)


@partial(jax.jit, static_argnums=(1, 2))
def random_rollout(run_seed: Array, num_envs: int, num_steps: int) -> RolloutStats:
    """Uniform-random policy, auto-reset, lockstep batch — the throughput
    benchmark kernel (BASELINE north star: env-steps/s/chip).

    Action keys come from the same counter stream discipline as spawns, so
    the entire rollout is replayable from ``run_seed``.
    """
    state = envlib.reset_batch(run_seed, num_envs)

    def body(carry, t):
        state, stats = carry
        # Uniform random legal-agnostic actions from the counter RNG (invalid
        # moves are legal no-ops in 2048 — the env handles them).
        from simulate_2048_tpu.ops import rng as tfrng

        bits0, _ = tfrng.threefry2x32(
            (jnp.full((num_envs,), 0x2048_0003, jnp.uint32), state.game_seed),
            (jnp.full((num_envs,), t, jnp.uint32), state.spawn_count),
        )
        actions = (bits0 % 4).astype(jnp.int32)
        new_state, reward, done, _ = envlib.step_auto_reset(state, actions)
        stats = RolloutStats(
            episodes_finished=stats.episodes_finished + jnp.sum(done.astype(jnp.int32)),
            total_reward=stats.total_reward + jnp.sum(reward),
            max_tile=jnp.maximum(stats.max_tile, jnp.max(ops.max_tile(new_state.board))),
            steps=stats.steps + num_envs,
        )
        return (new_state, stats), None

    stats0 = RolloutStats(jnp.int32(0), jnp.float32(0), jnp.int32(0), jnp.int32(0))
    (state, stats), _ = jax.lax.scan(body, (state, stats0), jnp.arange(num_steps, dtype=jnp.int32))
    return stats


def policy_rollout(state: envlib.GameState, policy_fn, num_steps: int, temperature: float, key: Array):
    """Roll a batched policy for ``num_steps`` with done-masking (no reset).

    ``policy_fn(obs, legal_mask, key) -> policy_probs`` runs under the scan.
    Returns (final state, per-step (obs, action, reward, done, policy) stacked
    along time) — the self-play trajectory collector builds on this.
    """

    def body(carry, step_key):
        state = carry
        obs = envlib.get_observation(state)
        legal = envlib.get_legal_actions(state)
        probs = policy_fn(obs, legal, step_key)
        actions = ops.sample_action(step_key, temperature, probs, legal)
        new_state, reward, done, _ = envlib.step(state, actions)
        out = (obs, actions, reward, done, probs)
        return new_state, out

    keys = jax.random.split(key, num_steps)
    final_state, traj = jax.lax.scan(body, state, keys)
    return final_state, traj
