"""Device-resident prioritized trajectory replay.

The reference keeps replay on host NumPy with a prefetch thread
(``reinforce/training/replay_buffer.py:76-574``). Here the buffer is a pytree
of device arrays and every operation — circular insert, priority sampling,
K+1-window gather, importance weights, priority update — is a pure jitted
function, so sampling composes into the train step (no host↔device copies,
no thread). Boards are stored as int8 exponents (16 bytes/step instead of 64)
and encoded to float observations at gather time.

Priorities are per-trajectory, computed like the reference
(max(1, var(values)+0.1), ``replay_buffer.py:130-155`` — NOT the paper's
|v−z|), but unlike the reference ``update_priorities`` is actually wired into
the trainer (the reference never calls it — SURVEY.md §2.4 #21).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.losses import TrainingTargets

Array = jax.Array


class Trajectory(NamedTuple):
    """A batch of fixed-capacity episodes (``replay_buffer.py:35-73``).

    ``boards`` hold exponent boards; slot t of actions/rewards/policies/values
    describes the transition out of boards[t]. ``length`` is the number of
    real steps; storage beyond it is padding.
    """

    boards: Array  # (B, T+1, 16) int8 exponents
    actions: Array  # (B, T) int8
    rewards: Array  # (B, T) f32
    policies: Array  # (B, T, A) f32
    values: Array  # (B, T) f32 search values at collection time
    length: Array  # (B,) i32
    # True ⇒ the game actually ended inside this segment; False ⇒ the segment
    # was truncated and the game continues in a later segment (the reference
    # caps whole GAMES at 200 moves, ``self_play.py:314`` — here 200 is the
    # trajectory-segment cap like the paper's buffer spec, and long games
    # span segments).
    terminated: Array  # (B,) bool
    total_reward: Array  # (B,) f32 reward earned within this segment
    max_tile: Array  # (B,) i32


class BufferState(NamedTuple):
    """Circular trajectory store + priorities, all on device."""

    boards: Array  # (cap, T+1, 16) int8
    actions: Array  # (cap, T) int8
    rewards: Array  # (cap, T) f32
    policies: Array  # (cap, T, A) f32
    values: Array  # (cap, T) f32
    length: Array  # (cap,) i32
    terminated: Array  # (cap,) bool
    total_reward: Array  # (cap,) f32
    max_tile: Array  # (cap,) i32
    priorities: Array  # (cap,) f32 (0 ⇒ empty slot)
    write_pos: Array  # () i32
    size: Array  # () i32
    episodes_added: Array  # () i64-ish i32
    steps_added: Array  # () i32


def init_buffer(config: TrainConfig) -> BufferState:
    """Allocate an empty buffer for ``config.replay_buffer_size`` episodes."""
    cap, t, a = config.replay_buffer_size, config.max_trajectory_length, config.action_size
    return BufferState(
        boards=jnp.zeros((cap, t + 1, 16), jnp.int8),
        actions=jnp.zeros((cap, t), jnp.int8),
        rewards=jnp.zeros((cap, t), jnp.float32),
        policies=jnp.zeros((cap, t, a), jnp.float32),
        values=jnp.zeros((cap, t), jnp.float32),
        length=jnp.zeros((cap,), jnp.int32),
        terminated=jnp.zeros((cap,), jnp.bool_),
        total_reward=jnp.zeros((cap,), jnp.float32),
        max_tile=jnp.zeros((cap,), jnp.int32),
        priorities=jnp.zeros((cap,), jnp.float32),
        write_pos=jnp.int32(0),
        size=jnp.int32(0),
        episodes_added=jnp.int32(0),
        steps_added=jnp.int32(0),
    )


def trajectory_priority(traj: Trajectory) -> Array:
    """Reference priority heuristic: max(1, variance of search values + 0.1)
    over the real steps (``replay_buffer.py:130-155``)."""
    t = traj.values.shape[-1]
    mask = jnp.arange(t)[None, :] < traj.length[:, None]
    n = jnp.maximum(traj.length, 1).astype(jnp.float32)
    mean = jnp.sum(traj.values * mask, -1) / n
    var = jnp.sum(jnp.square(traj.values - mean[:, None]) * mask, -1) / n
    return jnp.maximum(1.0, var + 0.1)


@jax.jit
def add_trajectories(state: BufferState, traj: Trajectory) -> BufferState:
    """Circular insert of a batch of episodes (``replay_buffer.py:106-128``)."""
    import chex

    batch = traj.length.shape[0]
    cap = state.priorities.shape[0]
    t = state.actions.shape[1]
    chex.assert_shape(traj.boards, (batch, t + 1, 16))
    chex.assert_shape(traj.actions, (batch, t))
    chex.assert_shape(traj.policies, (batch, t, state.policies.shape[-1]))
    chex.assert_type(traj.boards, jnp.int8)
    idx = (state.write_pos + jnp.arange(batch)) % cap
    prios = trajectory_priority(traj)
    return state._replace(
        boards=state.boards.at[idx].set(traj.boards),
        actions=state.actions.at[idx].set(traj.actions),
        rewards=state.rewards.at[idx].set(traj.rewards),
        policies=state.policies.at[idx].set(traj.policies),
        values=state.values.at[idx].set(traj.values),
        length=state.length.at[idx].set(traj.length),
        terminated=state.terminated.at[idx].set(traj.terminated),
        total_reward=state.total_reward.at[idx].set(traj.total_reward),
        max_tile=state.max_tile.at[idx].set(traj.max_tile),
        priorities=state.priorities.at[idx].set(prios),
        write_pos=(state.write_pos + batch) % cap,
        size=jnp.minimum(state.size + batch, cap),
        episodes_added=state.episodes_added + batch,
        steps_added=state.steps_added + jnp.sum(traj.length),
    )


@partial(jax.jit, static_argnums=(2, 3))
def sample_batch(
    state: BufferState, key: Array, batch_size: int, config: TrainConfig
) -> tuple[TrainingTargets, Array, Array]:
    """Prioritized sample of K+1 training windows.

    Returns (targets with leading batch dim, episode indices, IS weights).
    Mirrors ``replay_buffer.py:258-359`` with the gather on device:
    p ∝ priority^α over filled slots; window start uniform over real steps;
    beyond-terminal positions get value 0, uniform policy, reward 0 (an
    absorbing-state correction; the reference edge-pads instead,
    ``replay_buffer.py:319-345``).
    """
    priority_alpha = config.priority_alpha
    priority_beta = config.priority_beta
    action_size = config.action_size
    k = config.num_unroll_steps
    cap = state.priorities.shape[0]

    valid = jnp.arange(cap) < state.size
    logp = jnp.where(valid, priority_alpha * jnp.log(jnp.maximum(state.priorities, 1e-9)), -jnp.inf)
    key_idx, key_start = jax.random.split(key)
    idx = jax.random.categorical(key_idx, logp, shape=(batch_size,))

    # Importance-sampling weights (N·p)^{-β}, max-normalized.
    probs = jax.nn.softmax(logp)
    p_sel = probs[idx]
    n = jnp.maximum(state.size, 1).astype(jnp.float32)
    weights = jnp.power(n * jnp.maximum(p_sel, 1e-12), -priority_beta)
    weights = weights / jnp.maximum(jnp.max(weights), 1e-12)

    lengths = state.length[idx]
    terminated = state.terminated[idx]
    # Terminated episodes: windows may cross the end (absorbing-state masking
    # below teaches terminal values). Truncated segments: the game continues
    # beyond the stored steps, so windows must stay inside [0, length-K) —
    # there is no valid target past the boundary.
    max_start = jnp.where(terminated, lengths, jnp.maximum(lengths - k, 1))
    start = (jax.random.randint(key_start, (batch_size,), 0, 1 << 30) % jnp.maximum(max_start, 1)).astype(
        jnp.int32
    )

    offsets = jnp.arange(k + 1)
    t_idx = start[:, None] + offsets[None, :]  # (B, K+1) unclamped
    in_range = t_idx < lengths[:, None]
    t_clamped = jnp.minimum(t_idx, jnp.maximum(lengths[:, None] - 1, 0))

    def gather_ep(field: Array, ep: Array, ts: Array) -> Array:
        return field[ep][ts]

    observations = jax.vmap(gather_ep, in_axes=(None, 0, 0))(
        state.boards, idx, jnp.minimum(t_idx, state.boards.shape[1] - 1)
    ).astype(jnp.float32) / 16.0  # (B, K+1, 16) — ops.board.encode_observation convention

    actions = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.actions, idx, t_clamped[:, :k])
    rewards = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.rewards, idx, t_clamped[:, :k])
    policies = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.policies, idx, t_clamped)
    values = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.values, idx, t_clamped)

    uniform = jnp.full((action_size,), 1.0 / action_size)
    policies = jnp.where(in_range[..., None], policies, uniform)
    values = jnp.where(in_range, values, 0.0)
    rewards = jnp.where(in_range[:, :k], rewards, 0.0)

    targets = TrainingTargets(
        observations=observations,
        actions=actions.astype(jnp.int32),
        target_policies=policies,
        target_values=values,
        target_rewards=rewards,
    )
    return targets, idx, weights


@jax.jit
def update_priorities(state: BufferState, indices: Array, new_priorities: Array) -> BufferState:
    """Write back priorities for sampled episodes (``replay_buffer.py:361-374``)."""
    return state._replace(
        priorities=state.priorities.at[indices].set(jnp.maximum(new_priorities, 1e-6))
    )


def is_ready(state: BufferState, min_size: int) -> bool:
    """Whether training may start (``replay_buffer.py:406-414``)."""
    return int(state.size) >= min_size


def get_statistics(state: BufferState) -> dict:
    """Host-side summary (``replay_buffer.py:376-404``)."""
    size = int(state.size)
    sl = slice(0, max(size, 1))
    return {
        "size": size,
        "capacity": int(state.priorities.shape[0]),
        "episodes_added": int(state.episodes_added),
        "steps_added": int(state.steps_added),
        "mean_episode_reward": float(jnp.mean(state.total_reward[sl])) if size else 0.0,
        "mean_episode_length": float(jnp.mean(state.length[sl])) if size else 0.0,
        "max_tile": int(jnp.max(state.max_tile[sl])) if size else 0,
        "mean_priority": float(jnp.mean(state.priorities[sl])) if size else 0.0,
    }
