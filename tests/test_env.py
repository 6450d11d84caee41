"""Functional env: reset/step contract, freezing on done, auto-reset,
batching, and replayability."""

import jax
import jax.numpy as jnp
import numpy as np

from simulate_2048_tpu.env import (
    Environment,
    GameState,
    get_legal_actions,
    get_observation,
    reset,
    reset_batch,
    step,
    step_auto_reset,
)
from simulate_2048_tpu.ops import board as ops


def test_reset_invariants():
    state = reset(jnp.uint32(0))
    assert int(ops.count_empty(state.board)) == 14
    assert not bool(state.done)
    assert int(state.spawn_count) == 2
    assert float(state.total_reward) == 0.0


def test_reset_batch_distinct_boards():
    state = reset_batch(7, 32)
    assert state.board.shape == (32, 4, 4)
    flat = np.asarray(state.board).reshape(32, -1)
    assert len({row.tobytes() for row in flat}) > 1


def test_step_is_pure_and_replayable():
    state = reset(jnp.uint32(5))
    s1, r1, d1, _ = step(state, jnp.int32(0))
    s2, r2, d2, _ = step(state, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(s1.board), np.asarray(s2.board))
    assert float(r1) == float(r2)


def test_done_freezes_state():
    stuck = ops.values_to_exponents(
        jnp.array([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]])
    )
    state = reset(jnp.uint32(0))._replace(board=stuck, done=jnp.bool_(True))
    new_state, reward, done, _ = step(state, jnp.int32(0))
    assert bool(done) and float(reward) == 0.0
    np.testing.assert_array_equal(np.asarray(new_state.board), np.asarray(stuck))


def test_invalid_move_consumes_no_spawn():
    board = ops.values_to_exponents(jnp.array([[2, 4, 8, 16], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]))
    state = reset(jnp.uint32(0))._replace(board=board)
    # Left is illegal (row is packed, no merges); spawn_count must not change.
    new_state, reward, done, info = step(state, jnp.int32(0))
    assert float(reward) == 0.0
    assert int(new_state.spawn_count) == int(state.spawn_count)
    np.testing.assert_array_equal(np.asarray(new_state.board), np.asarray(board))
    # step_count still increments (a move was attempted).
    assert int(new_state.step_count) == 1


def test_auto_reset_replaces_finished_games():
    stuck = ops.values_to_exponents(
        jnp.array([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]])
    )
    state = reset_batch(0, 4)
    boards = jnp.stack([stuck, state.board[1], stuck, state.board[3]])
    # Mark 0 and 2 as about-to-be-done by injecting stuck boards.
    state = state._replace(board=boards)
    new_state, reward, done, _ = step_auto_reset(state, jnp.zeros(4, jnp.int32))
    done = np.asarray(done)
    assert done[0] and done[2]
    # Replaced games are fresh: 2 tiles, episode_index bumped.
    assert int(ops.count_empty(new_state.board[0])) == 14
    assert int(new_state.episode_index[0]) == 1
    assert int(new_state.episode_index[1]) == 0


def test_observation_and_legal_mask_shapes():
    state = reset_batch(1, 8)
    assert get_observation(state).shape == (8, 16)
    assert get_legal_actions(state).shape == (8, 4)


def test_environment_shell_plays():
    env = Environment(seed=3)
    obs = env.reset(seed=3)
    assert obs.shape == (16,)
    total = 0.0
    for i in range(20):
        obs, reward, done, info = env.step(i % 4)
        total += reward
        if done:
            break
    assert total >= 0.0


def test_jit_step_and_vmap_consistency():
    state = reset_batch(11, 16)
    actions = jnp.arange(16, dtype=jnp.int32) % 4
    s_direct, r_direct, d_direct, _ = step(state, actions)
    s_vmap, r_vmap, d_vmap, _ = jax.jit(jax.vmap(step))(state, actions)
    np.testing.assert_array_equal(np.asarray(s_direct.board), np.asarray(s_vmap.board))
    np.testing.assert_allclose(np.asarray(r_direct), np.asarray(r_vmap))


class TestRolloutDrivers:
    def test_random_rollout_stats(self):
        from simulate_2048_tpu.ops.rollout import random_rollout

        stats = random_rollout(jnp.uint32(3), 64, 32)
        assert int(stats.steps) == 64 * 32
        assert float(stats.total_reward) > 0
        assert int(stats.max_tile) >= 8
        # Deterministic in the run seed.
        stats2 = random_rollout(jnp.uint32(3), 64, 32)
        assert int(stats2.episodes_finished) == int(stats.episodes_finished)
        assert float(stats2.total_reward) == float(stats.total_reward)

    def test_policy_rollout_shapes(self):
        from simulate_2048_tpu.ops.rollout import policy_rollout

        state = reset_batch(1, 8)
        policy_fn = lambda obs, legal, key: jnp.full((8, 4), 0.25)
        final, (obs, actions, rewards, dones, probs) = jax.jit(
            lambda s, k: policy_rollout(s, policy_fn, 6, 1.0, k)
        )(state, jax.random.PRNGKey(0))
        assert obs.shape == (6, 8, 16)
        assert actions.shape == (6, 8)
        assert probs.shape == (6, 8, 4)
