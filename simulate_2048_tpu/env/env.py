"""Functional 2048 environment on the TPU engine.

Counterpart of the reference's ``reinforce/game/env.py`` with one structural
change: the environment is **self-contained** — stochasticity lives in the
state as a (game_seed, spawn_count) counter-RNG cursor (see ``ops/rng.py``)
instead of a PRNGKey threaded through every call. That makes ``step`` a pure
function of (state, action): no key plumbing in rollout loops, bitwise replay
of any game from its seed, and trivially maskable/vmappable under jit.

The reference's API surface (``reset``/``step``/``get_observation``/
``get_legal_actions`` + ``batched_*`` + a stateful ``Environment`` shell,
``env.py:33-305``) is preserved.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from simulate_2048_tpu.ops import board as ops
from simulate_2048_tpu.ops import rng as tfrng

Array = jax.Array


class GameState(NamedTuple):
    """Complete, replayable state of one 2048 game.

    Mirrors the reference ``GameState`` (``env.py:33-54``: board, step_count,
    done, total_reward) plus the RNG cursor fields that make the state
    self-contained.
    """

    board: Array  # (4, 4) int32 exponents (0 = empty, e = tile 2**e)
    step_count: Array  # int32 — moves taken this episode
    done: Array  # bool
    total_reward: Array  # float32 — cumulative raw score
    game_seed: Array  # uint32 — this episode's spawn stream
    spawn_count: Array  # uint32 — spawns consumed (2 after reset)
    episode_index: Array  # uint32 — bumps on auto-reset, reseeding the stream


def reset(game_seed: Array) -> GameState:
    """Fresh episode from a uint32 seed (scalar or batch shaped).

    Equivalent to ``env.py:56-78`` with the key replaced by the seed.
    """
    game_seed = jnp.asarray(game_seed, dtype=jnp.uint32)
    shape = game_seed.shape
    return GameState(
        board=ops.create_initial_board(game_seed),
        step_count=jnp.zeros(shape, jnp.int32),
        done=jnp.zeros(shape, jnp.bool_),
        total_reward=jnp.zeros(shape, jnp.float32),
        game_seed=game_seed,
        spawn_count=jnp.full(shape, 2, jnp.uint32),
        episode_index=jnp.zeros(shape, jnp.uint32),
    )


def reset_batch(run_seed: int | Array, num_envs: int) -> GameState:
    """Batch of independent episodes derived from one run seed."""
    idx = jnp.arange(num_envs, dtype=jnp.uint32)
    seeds = tfrng.derive_game_seeds(jnp.uint32(run_seed), idx, jnp.zeros_like(idx))
    return reset(seeds)


def step(state: GameState, action: Array) -> tuple[GameState, Array, Array, dict[str, Any]]:
    """One transition. Returns (new_state, reward, done, info).

    Semantics match ``env.py:80-135``: once done, the state freezes and
    rewards are 0; invalid moves leave the board unchanged with reward 0
    and consume no spawn.
    """
    b0, b1 = tfrng.spawn_bits(state.game_seed, state.spawn_count)
    next_board, reward, moved = ops.next_state(state.board, action, b0, b1)

    active = ~state.done
    board = jnp.where(active[..., None, None], next_board, state.board)
    reward = jnp.where(active, reward, 0.0)
    moved = moved & active
    done = state.done | ops.is_done(board)

    new_state = GameState(
        board=board,
        step_count=state.step_count + active.astype(jnp.int32),
        done=done,
        total_reward=state.total_reward + reward,
        game_seed=state.game_seed,
        spawn_count=state.spawn_count + moved.astype(jnp.uint32),
        episode_index=state.episode_index,
    )
    info = {
        "max_tile": ops.max_tile(board),
        "num_empty": ops.count_empty(board),
        "moved": moved,
        "step_count": new_state.step_count,
    }
    return new_state, reward, done, info


def step_auto_reset(state: GameState, action: Array) -> tuple[GameState, Array, Array, dict[str, Any]]:
    """Step that replaces finished games with fresh ones (100% utilization).

    The reference pays done-masked idle slots in lockstep batches
    (``self_play.py:311-370``); auto-reset keeps every lane busy. The new
    episode's stream is ``derive_game_seeds(game_seed, 0, episode_index+1)``,
    so replay remains deterministic. ``done`` returned is the PRE-reset
    terminal flag (trajectory boundary marker).
    """
    new_state, reward, done, info = step(state, action)

    next_ep = state.episode_index + 1
    reseed = tfrng.derive_game_seeds(jnp.uint32(0), state.game_seed, next_ep)
    fresh = reset(reseed)
    fresh = fresh._replace(episode_index=next_ep)

    out = jax.tree.map(
        lambda f, s: jnp.where(
            done.reshape(done.shape + (1,) * (f.ndim - done.ndim)), f, s
        ),
        fresh,
        new_state,
    )
    return out, reward, done, info


def reset_done(state: GameState) -> GameState:
    """Replace finished games with fresh episodes; active games untouched.

    The segment-boundary counterpart of :func:`step_auto_reset`'s in-step
    reset (same deterministic reseed: ``derive_game_seeds(0, game_seed,
    episode_index+1)``). Used by segmented self-play so games continue across
    trajectory segments and dead lanes restart at the next segment.
    """
    next_ep = state.episode_index + 1
    reseed = tfrng.derive_game_seeds(jnp.uint32(0), state.game_seed, next_ep)
    fresh = reset(reseed)._replace(episode_index=next_ep)
    done = state.done
    return jax.tree.map(
        lambda f, s: jnp.where(done.reshape(done.shape + (1,) * (f.ndim - done.ndim)), f, s),
        fresh,
        state,
    )


def get_observation(state: GameState) -> Array:
    """Flattened float observation in [0, 1] (``env.py:137-153``)."""
    return ops.encode_observation(state.board)


def get_legal_actions(state: GameState) -> Array:
    """Boolean (…, 4) legal-action mask (``env.py:155-173``)."""
    return ops.legal_actions_mask(state.board)


# ---------------------------------------------------------------------------
# Batched wrappers (``env.py:176-245``). The underlying ops broadcast over
# leading dims natively, so these exist for API parity and explicitness.
# ---------------------------------------------------------------------------

batched_reset = jax.jit(jax.vmap(reset))
batched_step = jax.jit(jax.vmap(step))
batched_get_observation = jax.jit(jax.vmap(get_observation))
batched_get_legal_actions = jax.jit(jax.vmap(get_legal_actions))


class Environment:
    """Small stateful shell over the functional API for debugging/demos
    (``env.py:248-305``)."""

    def __init__(self, seed: int = 0):
        self._jit_step = jax.jit(step)
        self._state = reset(jnp.uint32(seed))

    @property
    def state(self) -> GameState:
        return self._state

    @property
    def board_values(self) -> Array:
        return ops.exponents_to_values(self._state.board)

    def reset(self, seed: int | None = None) -> Array:
        if seed is not None:
            self._state = reset(jnp.uint32(seed))
        else:
            self._state = reset(self._state.game_seed + jnp.uint32(1))
        return get_observation(self._state)

    def step(self, action: int) -> tuple[Array, float, bool, dict[str, Any]]:
        self._state, reward, done, info = self._jit_step(self._state, jnp.int32(action))
        return get_observation(self._state), float(reward), bool(done), info

    def legal_actions(self) -> Array:
        return get_legal_actions(self._state)

    def render(self) -> None:
        import numpy as np

        for row in np.asarray(self.board_values).tolist():
            print(" \t".join(map(str, row)))
