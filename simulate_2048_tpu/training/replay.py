"""Device-resident prioritized trajectory replay.

The reference keeps replay on host NumPy with a prefetch thread
(``reinforce/training/replay_buffer.py:76-574``). Here the buffer is a pytree
of device arrays and every operation — circular insert, priority sampling,
K+1-window gather, importance weights, priority update — is a pure jitted
function, so sampling composes into the train step (no host↔device copies,
no thread).

Storage is compressed for HBM (full config = 125k slots x 200 steps):
boards int8 exponents (16 B/step), policies f16, values/rewards/priorities
bf16 — ~0.74 GB total vs ~1.1 GB all-f32 (see ``tests/test_training.py::
TestBufferFootprint``). Everything is cast back to f32 at gather time.

Priorities are PER POSITION (paper App. C: p_t = |ν_t − z_t|, the gap between
the stored search value and the n-step return), not per trajectory as both the
reference (``replay_buffer.py:130-155`` — a variance heuristic, never updated)
and this repo's round 1 kept them. Sampling draws (episode, step) via an exact
two-level factorization of the flattened categorical:
P(ep, t) = p_t^α / Σ = [Σ_{t'∈ep} p^α / Σ] · [p_t^α / Σ_{t'∈ep} p^α],
so episode-then-step sampling is distributionally identical to sampling the
25M-position flat categorical without materializing per-sample 25M logits.
The learner refreshes the sampled positions' priorities after every step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.losses import TrainingTargets

Array = jax.Array

# Storage dtypes (cast to f32 at gather).
POLICY_DTYPE = jnp.float16  # probabilities in [0, 1]: f16 keeps ~3 digits
VALUE_DTYPE = jnp.bfloat16  # returns reach ~1e6 (> f16 max): bf16 keeps range
REWARD_DTYPE = jnp.bfloat16
PRIORITY_DTYPE = jnp.bfloat16  # |v − z| magnitudes, precision uncritical


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
    priorities: Array  # (B, T) f32 per-position |ν_t − z_t| (paper App. C)
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
    """Circular trajectory store + per-position priorities, all on device."""

    boards: Array  # (cap, T+1, 16) int8
    actions: Array  # (cap, T) int8
    rewards: Array  # (cap, T) bf16
    policies: Array  # (cap, T, A) f16
    values: Array  # (cap, T) bf16
    length: Array  # (cap,) i32
    terminated: Array  # (cap,) bool
    total_reward: Array  # (cap,) f32
    max_tile: Array  # (cap,) i32
    step_priorities: Array  # (cap, T) bf16 (0 ⇒ unsampleable position)
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
        rewards=jnp.zeros((cap, t), REWARD_DTYPE),
        policies=jnp.zeros((cap, t, a), POLICY_DTYPE),
        values=jnp.zeros((cap, t), VALUE_DTYPE),
        length=jnp.zeros((cap,), jnp.int32),
        terminated=jnp.zeros((cap,), jnp.bool_),
        total_reward=jnp.zeros((cap,), jnp.float32),
        max_tile=jnp.zeros((cap,), jnp.int32),
        step_priorities=jnp.zeros((cap, t), PRIORITY_DTYPE),
        write_pos=jnp.int32(0),
        size=jnp.int32(0),
        episodes_added=jnp.int32(0),
        steps_added=jnp.int32(0),
    )


def trajectory_priority(traj: Trajectory) -> Array:
    """Reference priority heuristic: max(1, variance of search values + 0.1)
    over the real steps (``replay_buffer.py:130-155``). Kept for parity and as
    the episode-level fallback when a trajectory carries no per-step
    priorities; the live path uses ``traj.priorities`` (paper |ν − z|)."""
    t = traj.values.shape[-1]
    mask = jnp.arange(t)[None, :] < traj.length[:, None]
    n = jnp.maximum(traj.length, 1).astype(jnp.float32)
    mean = jnp.sum(traj.values * mask, -1) / n
    var = jnp.sum(jnp.square(traj.values - mean[:, None]) * mask, -1) / n
    return jnp.maximum(1.0, var + 0.1)


@jax.jit
def add_trajectories(state: BufferState, traj: Trajectory) -> BufferState:
    """Circular insert of a batch of episodes (``replay_buffer.py:106-128``).

    Per-position priorities are floored at 1e-3 inside the episode (every real
    position stays sampleable) and zeroed outside it; the sampling-time
    valid-START window (terminated episodes may start anywhere; truncated
    segments only where a full K-window fits) is applied in
    :func:`sample_batch`.
    """
    import chex

    batch = traj.length.shape[0]
    cap = state.length.shape[0]
    t = state.actions.shape[1]
    chex.assert_shape(traj.boards, (batch, t + 1, 16))
    chex.assert_shape(traj.actions, (batch, t))
    chex.assert_shape(traj.policies, (batch, t, state.policies.shape[-1]))
    chex.assert_shape(traj.priorities, (batch, t))
    chex.assert_type(traj.boards, jnp.int8)
    idx = (state.write_pos + jnp.arange(batch)) % cap
    in_ep = jnp.arange(t)[None, :] < traj.length[:, None]
    prios = jnp.where(in_ep, jnp.maximum(traj.priorities, 1e-3), 0.0)
    return state._replace(
        boards=state.boards.at[idx].set(traj.boards),
        actions=state.actions.at[idx].set(traj.actions),
        rewards=state.rewards.at[idx].set(traj.rewards.astype(REWARD_DTYPE)),
        policies=state.policies.at[idx].set(traj.policies.astype(POLICY_DTYPE)),
        values=state.values.at[idx].set(traj.values.astype(VALUE_DTYPE)),
        length=state.length.at[idx].set(traj.length),
        terminated=state.terminated.at[idx].set(traj.terminated),
        total_reward=state.total_reward.at[idx].set(traj.total_reward),
        max_tile=state.max_tile.at[idx].set(traj.max_tile),
        step_priorities=state.step_priorities.at[idx].set(prios.astype(PRIORITY_DTYPE)),
        write_pos=(state.write_pos + batch) % cap,
        size=jnp.minimum(state.size + batch, cap),
        episodes_added=state.episodes_added + batch,
        steps_added=state.steps_added + jnp.sum(traj.length),
    )


def _sampling_weights(state: BufferState, config: TrainConfig) -> Array:
    """(cap, T) sampling weights w = p^α over valid window starts, 0 elsewhere."""
    k = config.num_unroll_steps
    t = state.actions.shape[1]
    w = state.step_priorities.astype(jnp.float32)
    if config.priority_alpha != 1.0:
        w = jnp.power(w, config.priority_alpha)
    # Valid start positions: terminated episodes may start anywhere in the
    # episode (windows cross the end under absorbing-state masking); truncated
    # segments must fit the whole K-window before the boundary (the game
    # continues elsewhere — there is no valid target past it).
    max_start = jnp.where(
        state.terminated, state.length, jnp.maximum(state.length - k, 1)
    )
    valid = (jnp.arange(t)[None, :] < max_start[:, None]) & (
        jnp.arange(t)[None, :] < state.length[:, None]
    )
    return jnp.where(valid, w, 0.0)


@partial(jax.jit, static_argnums=(2, 3))
def sample_batch(
    state: BufferState, key: Array, batch_size: int, config: TrainConfig
) -> tuple[TrainingTargets, Array, Array]:
    """Prioritized sample of K+1 training windows at PER-POSITION granularity.

    Returns ``(targets, indices (B, 2) of (episode, start), IS weights)``.
    Counterpart of ``replay_buffer.py:258-359`` upgraded to the paper's
    position-level prioritization: (episode, start) ~ p_t^α via the exact
    two-level factorization (episode ∝ its α-weight mass, then start within
    the episode), IS weights (N·P)^{-β} max-normalized with N = number of
    sampleable positions. Beyond-terminal positions get value 0, uniform
    policy, reward 0 (an absorbing-state correction; the reference edge-pads
    instead, ``replay_buffer.py:319-345``).
    """
    action_size = config.action_size
    k = config.num_unroll_steps

    w = _sampling_weights(state, config)  # (cap, T)
    ep_mass = jnp.sum(w, axis=-1)  # (cap,)
    total_mass = jnp.maximum(jnp.sum(ep_mass), 1e-12)

    key_ep, key_t = jax.random.split(key)
    ep_logits = jnp.where(ep_mass > 0, jnp.log(jnp.maximum(ep_mass, 1e-12)), -jnp.inf)
    idx = jax.random.categorical(key_ep, ep_logits, shape=(batch_size,))

    rows = w[idx]  # (B, T)
    t_logits = jnp.where(rows > 0, jnp.log(jnp.maximum(rows, 1e-12)), -jnp.inf)
    start = jax.random.categorical(key_t, t_logits, axis=-1).astype(jnp.int32)

    # Importance-sampling weights over the flat position distribution.
    p_sel = jnp.take_along_axis(rows, start[:, None], axis=-1)[:, 0] / total_mass
    n = jnp.maximum(jnp.sum((w > 0).astype(jnp.float32)), 1.0)
    weights = jnp.power(n * jnp.maximum(p_sel, 1e-12), -config.priority_beta)
    weights = weights / jnp.maximum(jnp.max(weights), 1e-12)

    lengths = state.length[idx]

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
    rewards = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.rewards, idx, t_clamped[:, :k]).astype(
        jnp.float32
    )
    policies = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.policies, idx, t_clamped).astype(
        jnp.float32
    )
    values = jax.vmap(gather_ep, in_axes=(None, 0, 0))(state.values, idx, t_clamped).astype(
        jnp.float32
    )

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
    indices = jnp.stack([idx.astype(jnp.int32), start], axis=1)
    return targets, indices, weights


@partial(jax.jit, static_argnums=(6,))
def backfill_returns(
    state: BufferState,
    slots: Array,
    cont: Array,
    seq: Array,
    nu0_next: Array,
    z0_next: Array,
    config: TrainConfig,
) -> BufferState:
    """Ground a truncated segment's value targets with its successor segment.

    A game that outlives one ``max_trajectory_length`` segment stores, at
    collection time, a boundary target forced to its own search value ν_last
    (``self_play.compute_n_step_returns``) — the entire unobserved tail is the
    current net's guess. Round-2 soaks showed exactly this anchor going stale
    as games grow past one segment (docs/project.md). Once the NEXT segment of
    the same game has been played, the true continuation is known one hop
    further: the boundary target becomes

        G'_{L-1} = r_{L-1} + γ·[(1−λ)·ν_0^{next} + λ·z_0^{next}]

    and, since a boundary perturbation re-enters earlier positions only
    through the λ-branch of the TD(λ) recursion, every stored target shifts in
    closed form:  z_t += (γλ)^{L-1-t} · (G'_{L-1} − z_{L-1}).

    Parameters
    ----------
    slots : (B,) buffer rows of each lane's PREVIOUS segment
    cont : (B,) bool — that segment was truncated (the game continued)
    seq : (B,) insertion sequence numbers of those rows (validity guard: a
        row is patched only if the circular buffer has not overwritten it)
    nu0_next : (B,) search values ν at the new segment's first position
    z0_next : (B,) stored targets z at the new segment's first position

    Priorities of patched positions are raised to at least the h-space target
    shift, so freshly grounded windows become (re-)sampleable promptly.
    """
    from simulate_2048_tpu.training.losses import scale_value

    gamma, lam = config.discount, config.td_lambda
    cap = state.length.shape[0]
    t = state.actions.shape[1]

    valid = cont & (state.episodes_added - seq <= cap)
    lengths = state.length[slots]  # (B,)
    last = jnp.maximum(lengths - 1, 0)
    old_values = state.values[slots].astype(jnp.float32)  # (B, T)
    z_last = jnp.take_along_axis(old_values, last[:, None], axis=-1)[:, 0]
    r_last = jnp.take_along_axis(
        state.rewards[slots].astype(jnp.float32), last[:, None], axis=-1
    )[:, 0]
    boundary = r_last + gamma * ((1.0 - lam) * nu0_next + lam * z0_next)
    delta = jnp.where(valid, boundary - z_last, 0.0)

    steps = jnp.arange(t)[None, :]
    in_ep = steps < lengths[:, None]
    factor = jnp.where(in_ep, jnp.power(gamma * lam, (last[:, None] - steps)), 0.0)
    new_values = old_values + factor * delta[:, None]

    old_prios = state.step_priorities[slots].astype(jnp.float32)
    shift = jnp.abs(
        scale_value(new_values, config.value_epsilon)
        - scale_value(old_values, config.value_epsilon)
    )
    new_prios = jnp.where(in_ep, jnp.maximum(old_prios, shift), old_prios)

    return state._replace(
        values=state.values.at[slots].set(new_values.astype(VALUE_DTYPE)),
        step_priorities=state.step_priorities.at[slots].set(
            new_prios.astype(PRIORITY_DTYPE)
        ),
    )


@jax.jit
def update_priorities(state: BufferState, indices: Array, new_priorities: Array) -> BufferState:
    """Write back priorities for sampled (episode, start) positions
    (``replay_buffer.py:361-374`` — which the reference never calls)."""
    ep, t = indices[:, 0], indices[:, 1]
    new = jnp.maximum(new_priorities, 1e-6).astype(PRIORITY_DTYPE)
    return state._replace(step_priorities=state.step_priorities.at[ep, t].set(new))


def is_ready(state: BufferState, min_size: int) -> bool:
    """Whether training may start (``replay_buffer.py:406-414``)."""
    return int(state.size) >= min_size


def buffer_nbytes(state: BufferState) -> int:
    """Exact device-memory footprint of the buffer pytree in bytes."""
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(state))


def get_statistics(state: BufferState) -> dict:
    """Host-side summary (``replay_buffer.py:376-404``)."""
    size = int(state.size)
    sl = slice(0, max(size, 1))
    prios = state.step_priorities[sl].astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum((prios > 0).astype(jnp.float32)), 1.0)
    return {
        "size": size,
        "capacity": int(state.length.shape[0]),
        "episodes_added": int(state.episodes_added),
        "steps_added": int(state.steps_added),
        "mean_episode_reward": float(jnp.mean(state.total_reward[sl])) if size else 0.0,
        "mean_episode_length": float(jnp.mean(state.length[sl])) if size else 0.0,
        "max_tile": int(jnp.max(state.max_tile[sl])) if size else 0,
        "mean_priority": float(jnp.sum(prios) / n_pos) if size else 0.0,
        "nbytes": buffer_nbytes(state),
    }
