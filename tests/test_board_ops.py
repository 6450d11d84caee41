"""JAX board kernels: semantics tables, jit/vmap contracts, and full
differential parity against the scalar NumPy engine (the cross-engine test the
reference lacked — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.engine import board as nb
from simulate_2048_tpu.engine import moves as nm
from simulate_2048_tpu.engine.board import create_initial_board_counter, next_state_counter
from simulate_2048_tpu.engine.rng import derive_game_seeds_np
from simulate_2048_tpu.ops import board as jb
from simulate_2048_tpu.ops import rng as jr


def to_values(board_exp) -> np.ndarray:
    return np.asarray(jb.exponents_to_values(jnp.asarray(board_exp)))


def to_exp(board_values) -> jnp.ndarray:
    return jb.values_to_exponents(jnp.asarray(board_values))


class TestSlideRows:
    CASES = [
        ([2, 2, 0, 0], [4, 0, 0, 0], 4),
        ([2, 2, 2, 2], [4, 4, 0, 0], 8),
        ([2, 2, 2, 0], [4, 2, 0, 0], 4),
        ([0, 2, 0, 2], [4, 0, 0, 0], 4),
        ([4, 4, 8, 8], [8, 16, 0, 0], 24),
        ([2, 4, 2, 4], [2, 4, 2, 4], 0),
        ([0, 0, 0, 0], [0, 0, 0, 0], 0),
        ([0, 0, 0, 2], [2, 0, 0, 0], 0),
        ([16, 16, 16, 0], [32, 16, 0, 0], 32),
    ]

    @pytest.mark.parametrize("row,expected,score", CASES)
    def test_case(self, row, expected, score):
        out, s = jb.slide_rows_left(to_exp(np.array(row)))
        vals = [0 if e == 0 else 2 ** int(e) for e in np.asarray(out)]
        assert vals == expected and int(s) == score

    def test_batched_rows(self):
        rows = to_exp(np.array([c[0] for c in self.CASES]))
        out, s = jb.slide_rows_left(rows)
        for i, (_, expected, score) in enumerate(self.CASES):
            vals = [0 if e == 0 else 2 ** int(e) for e in np.asarray(out[i])]
            assert vals == expected and int(s[i]) == score


class TestRandomizedEngineParity:
    """Drive both engines through identical random boards/actions."""

    def _random_board(self, rs) -> np.ndarray:
        exp = rs.randint(0, 12, size=(4, 4))
        exp[rs.rand(4, 4) < 0.4] = 0
        return (2.0**exp).astype(np.int64) * (exp > 0)

    def test_apply_action_matches_latent_state(self):
        rs = np.random.RandomState(0)
        for _ in range(200):
            board = self._random_board(rs)
            action = rs.randint(4)
            ref_board, ref_reward = nb.latent_state(board, action)
            out, score = jb.apply_action(to_exp(board), jnp.int32(action))
            np.testing.assert_array_equal(to_values(out), ref_board)
            assert int(score) == int(ref_reward)

    def test_legal_mask_matches(self):
        rs = np.random.RandomState(1)
        for _ in range(200):
            board = self._random_board(rs)
            ref = list(nm.legal_actions_mask(board))
            got = np.asarray(jb.legal_actions_mask(to_exp(board))).tolist()
            assert got == ref

    def test_is_done_matches(self):
        rs = np.random.RandomState(2)
        for _ in range(200):
            board = self._random_board(rs)
            assert bool(jb.is_done(to_exp(board))) == nb.is_done(board)


class TestSpawnParity:
    def test_spawn_tile_matches_oracle(self):
        rs = np.random.RandomState(3)
        for trial in range(100):
            exp = rs.randint(0, 5, size=(4, 4))
            exp[rs.rand(4, 4) < 0.5] = 0
            board = (2.0**exp).astype(np.int64) * (exp > 0)
            if (board == 0).sum() == 0:
                continue
            seed, idx = np.uint32(trial), np.uint32(7)
            oracle = nb.fill_cells_counter(board.copy(), seed, idx)
            b0, b1 = jr.spawn_bits(jnp.uint32(seed), jnp.uint32(idx))
            device = to_values(jb.spawn_tile(to_exp(board), b0, b1))
            np.testing.assert_array_equal(device, oracle)

    def test_initial_board_parity(self):
        for seed in range(50):
            oracle = create_initial_board_counter(seed)
            device = to_values(jb.create_initial_board(jnp.uint32(seed)))
            np.testing.assert_array_equal(device, oracle)


class TestSeedExactRollout:
    """BASELINE config 2: lockstep batched random rollouts, seed-exact vs the
    scalar oracle, including spawn-counter discipline on invalid moves."""

    def test_lockstep_rollout_parity(self):
        n_boards, n_steps, run_seed = 16, 60, 1234
        game_seeds = derive_game_seeds_np(run_seed, np.arange(n_boards), np.zeros(n_boards))

        # --- oracle side ---
        oracle_boards = [create_initial_board_counter(int(s)) for s in game_seeds]
        spawn_counts = [2] * n_boards
        action_rs = np.random.RandomState(run_seed)
        actions_all = action_rs.randint(0, 4, size=(n_steps, n_boards))
        oracle_rewards = np.zeros((n_steps, n_boards))
        for t in range(n_steps):
            for i in range(n_boards):
                if nb.is_done(oracle_boards[i]):
                    continue
                out, r, moved = next_state_counter(
                    oracle_boards[i], int(actions_all[t, i]), int(game_seeds[i]), spawn_counts[i]
                )
                oracle_boards[i] = out
                oracle_rewards[t, i] = r
                spawn_counts[i] += moved

        # --- device side (one jitted scan) ---
        seeds_j = jnp.asarray(game_seeds)
        boards = jb.create_initial_board(seeds_j)

        @jax.jit
        def rollout(boards, actions_all):
            def step(carry, actions):
                boards, spawn_counts, done = carry
                b0, b1 = jr.spawn_bits(seeds_j, spawn_counts)
                nxt, reward, moved = jb.next_state(boards, actions, b0, b1)
                active = ~done
                boards = jnp.where(active[:, None, None], nxt, boards)
                reward = jnp.where(active, reward, 0.0)
                spawn_counts = spawn_counts + (moved & active).astype(jnp.uint32)
                done = done | jb.is_done(boards)
                return (boards, spawn_counts, done), reward

            init = (boards, jnp.full((n_boards,), 2, jnp.uint32), jb.is_done(boards))
            (boards, _, _), rewards = jax.lax.scan(step, init, actions_all)
            return boards, rewards

        final, rewards = rollout(boards, jnp.asarray(actions_all))
        np.testing.assert_allclose(np.asarray(rewards), oracle_rewards)
        for i in range(n_boards):
            np.testing.assert_array_equal(to_values(final[i]), oracle_boards[i])


class TestJitVmapContracts:
    def test_jit_compilable(self):
        f = jax.jit(lambda b, a: jb.apply_action(b, a))
        board = to_exp(np.array([[2, 2, 0, 0]] * 4))
        out, score = f(board, jnp.int32(0))
        assert out.shape == (4, 4)

    def test_vmap_batching(self):
        boards = jnp.stack([to_exp(np.array([[2, 2, 0, 0]] * 4))] * 8)
        actions = jnp.zeros((8,), jnp.int32)
        out, score = jax.vmap(jb.apply_action)(boards, actions)
        assert out.shape == (8, 4, 4) and score.shape == (8,)
        # leading-dim broadcasting without vmap must agree
        out2, score2 = jb.apply_action(boards, actions)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        np.testing.assert_array_equal(np.asarray(score), np.asarray(score2))

    def test_encode_observation(self):
        board = to_exp(np.array([[0, 2, 4, 8], [2048, 0, 0, 0], [0] * 4, [0] * 4]))
        obs = np.asarray(jb.encode_observation(board))
        assert obs.shape == (16,)
        assert abs(obs[1] - 1 / 16) < 1e-6
        assert abs(obs[3] - 3 / 16) < 1e-6
        assert abs(obs[4] - 11 / 16) < 1e-6

    def test_max_tile_count_empty(self):
        board = to_exp(np.array([[0, 2, 4, 8], [0] * 4, [0] * 4, [0] * 4]))
        assert int(jb.max_tile(board)) == 8
        assert int(jb.count_empty(board)) == 13

    def test_sample_action_greedy_and_legal(self):
        key = jax.random.PRNGKey(0)
        policy = jnp.array([0.1, 0.6, 0.2, 0.1])
        mask = jnp.array([True, False, True, False])
        a = jb.sample_action(key, 0.0, policy, mask)
        assert int(a) == 2  # best legal
        for i in range(10):
            a = jb.sample_action(jax.random.PRNGKey(i), 1.0, policy, mask)
            assert int(a) in (0, 2)


class TestAfterstateOutcomes:
    """Device afterstate enumeration vs the host engine's after_state."""

    def test_matches_engine_enumeration(self):
        rs = np.random.RandomState(9)
        for _ in range(30):
            exp = rs.randint(0, 6, size=(4, 4))
            exp[rs.rand(4, 4) < 0.5] = 0
            board = (2.0**exp).astype(np.int64) * (exp > 0)
            ref = nb.after_state(board)

            boards, probs = jb.afterstate_outcomes(to_exp(board))
            boards, probs = np.asarray(boards), np.asarray(probs)
            # Collect device outcomes with nonzero probability.
            dev = []
            for j in range(32):
                if probs[j] > 0:
                    vals = np.where(boards[j] > 0, 2 ** boards[j].astype(np.int64), 0)
                    dev.append((vals, probs[j]))
            assert len(dev) == len(ref)
            key = lambda t: (t[0].tobytes(), round(float(t[1]), 9))
            for (db, dp), (rb, rp) in zip(sorted(dev, key=key), sorted(ref, key=key)):
                np.testing.assert_array_equal(db, rb)
                assert abs(dp - rp) < 1e-6
            assert abs(probs.sum() - 1.0) < 1e-5

    def test_full_board_single_outcome(self):
        board = 2 ** np.arange(1, 17).reshape(4, 4).astype(np.int64)
        boards, probs = jb.afterstate_outcomes(to_exp(board))
        probs = np.asarray(probs)
        assert probs[0] == 1.0 and probs[1:].sum() == 0.0
        vals = np.where(np.asarray(boards[0]) > 0, 2 ** np.asarray(boards[0]).astype(np.int64), 0)
        np.testing.assert_array_equal(vals, board)
