"""Scalar NumPy engine semantics (the reference's test_board/test_move/
test_environment coverage, rebuilt): merges, moves, afterstates, spawn
statistics, env contract, termination."""

import numpy as np
import pytest

from simulate_2048_tpu.engine import (
    TwentyFortyEight,
    after_state,
    after_state_lazy,
    fill_cells,
    generate_outcome,
    illegal_actions,
    is_done,
    latent_state,
    legal_actions,
    legal_actions_mask,
    merge_column,
    next_state,
    slide_and_merge,
)


class TestMergeColumn:
    def test_simple_merge(self):
        score, merged = merge_column(np.array([2, 2, 0, 0]))
        assert score == 4 and merged.tolist() == [4]

    def test_merge_once_per_tile(self):
        score, merged = merge_column(np.array([2, 2, 2, 2]))
        assert score == 8 and merged.tolist() == [4, 4]

    def test_leftmost_merge_priority(self):
        score, merged = merge_column(np.array([2, 2, 2, 0]))
        assert score == 4 and merged.tolist() == [4, 2]

    def test_zeros_ignored(self):
        score, merged = merge_column(np.array([2, 0, 0, 2]))
        assert score == 4 and merged.tolist() == [4]

    def test_no_merge(self):
        score, merged = merge_column(np.array([2, 4, 8, 16]))
        assert score == 0 and merged.tolist() == [2, 4, 8, 16]

    def test_empty(self):
        score, merged = merge_column(np.array([0, 0, 0, 0]))
        assert score == 0 and merged.size == 0


class TestSlideAndMerge:
    def test_board(self):
        board = np.array([[2, 2, 0, 0], [4, 0, 4, 0], [2, 4, 2, 4], [0, 0, 0, 2]])
        score, out = slide_and_merge(board)
        assert score == 12
        assert out.tolist() == [[4, 0, 0, 0], [8, 0, 0, 0], [2, 4, 2, 4], [2, 0, 0, 0]]


class TestLatentState:
    BOARD = np.array([[2, 2, 0, 0], [0, 0, 0, 0], [0, 4, 4, 0], [2, 0, 0, 2]])

    def test_left(self):
        out, r = latent_state(self.BOARD, 0)
        assert r == 16
        assert out.tolist() == [[4, 0, 0, 0], [0, 0, 0, 0], [8, 0, 0, 0], [4, 0, 0, 0]]

    def test_right(self):
        out, r = latent_state(self.BOARD, 2)
        assert r == 16
        assert out.tolist() == [[0, 0, 0, 4], [0, 0, 0, 0], [0, 0, 0, 8], [0, 0, 0, 4]]

    def test_up_down_move_tiles(self):
        up, r_up = latent_state(self.BOARD, 1)
        down, r_down = latent_state(self.BOARD, 3)
        assert up[3].tolist() == [0, 0, 0, 0]
        assert down[0].tolist() == [0, 0, 0, 0]
        assert r_up == 4 and r_down == 4  # column 0: 2+2 merges


class TestAfterstates:
    def test_probabilities_sum_to_one(self):
        state = np.array([[2, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 4]])
        outcomes = after_state(state)
        assert len(outcomes) == 14 * 2
        assert abs(sum(p for _, p in outcomes) - 1.0) < 1e-12

    def test_full_board_single_outcome(self):
        state = np.arange(1, 17).reshape(4, 4) * 2
        outcomes = after_state(state)
        assert len(outcomes) == 1 and outcomes[0][1] == 1.0

    def test_lazy_matches_eager(self):
        state = np.array([[2, 0, 4, 0], [0, 2, 0, 0], [8, 0, 0, 2], [0, 0, 2, 0]])
        eager = after_state(state)
        base, cells, n = after_state_lazy(state)
        lazy = [generate_outcome(base, c, v, n) for c in cells for v in (2, 4)]
        assert len(eager) == len(lazy)
        for (se, pe), (sl, pl) in zip(
            sorted(eager, key=lambda t: (t[0].tobytes(), t[1])),
            sorted(lazy, key=lambda t: (t[0].tobytes(), t[1])),
        ):
            assert np.array_equal(se, sl) and abs(pe - pl) < 1e-12

    def test_lazy_raises_on_full(self):
        state = np.arange(1, 17).reshape(4, 4) * 2
        with pytest.raises(ValueError):
            generate_outcome(state, (0, 0), 2, 0)


class TestMoves:
    def test_canonical_board(self):
        board = np.array([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [2, 2, 4, 8]])
        # bottom row has a horizontal merge (2,2) and col merges (4/4? no):
        legal = legal_actions(board)
        ill = illegal_actions(board)
        assert sorted(legal + ill) == [0, 1, 2, 3]
        mask = legal_actions_mask(board)
        assert [i for i in range(4) if mask[i]] == legal

    def test_stuck_board(self):
        board = np.array([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]])
        assert legal_actions(board) == []
        assert is_done(board)


class TestNextState:
    def test_valid_move_spawns(self):
        board = np.array([[2, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        out, reward = next_state(board.copy(), 0, seed=0)
        assert reward == 4
        assert (out != 0).sum() == 2  # merged tile + one spawn

    def test_invalid_move_noop(self):
        board = np.array([[2, 4, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        out, reward = next_state(board.copy(), 0, seed=0)  # already left-packed
        assert reward == 0
        assert np.array_equal(out, board)


class TestSpawnStatistics:
    def test_ninety_ten_split(self):
        # Statistical test in the spirit of the reference's
        # test_environment.py:246-302: 1000 spawns, ±5% tolerance.
        rng_seed = 0
        twos = fours = 0
        for i in range(1000):
            board = np.zeros((4, 4), dtype=np.int64)
            fill_cells(board, 1, seed=rng_seed + i)
            val = board.max()
            twos += val == 2
            fours += val == 4
        assert twos + fours == 1000
        assert 0.85 <= twos / 1000 <= 0.95

    def test_explicit_rng_stream_reproduces(self):
        # The convenience path's stream can be made explicit via rng=; two
        # identical generators must produce identical spawn sequences (and an
        # explicit rng wins over seed=).
        runs = []
        for _ in range(2):
            rng = np.random.default_rng(123)
            board = np.zeros((4, 4), dtype=np.int64)
            for _ in range(5):
                fill_cells(board, 1, seed=999, rng=rng)
            runs.append(board.copy())
        np.testing.assert_array_equal(runs[0], runs[1])
        # seed-only with a different seed diverges from the rng=123 stream
        board = np.zeros((4, 4), dtype=np.int64)
        for i in range(5):
            fill_cells(board, 1, seed=5000 + i)
        assert not np.array_equal(board, runs[0])


class TestEnvClass:
    def test_reset_two_tiles(self):
        env = TwentyFortyEight()
        obs = env.reset(seed=1)
        assert (obs != 0).sum() == 2
        assert set(np.unique(obs)) <= {0, 2, 4}

    def test_seed_reproducibility(self):
        a = TwentyFortyEight().reset(seed=99)
        b = TwentyFortyEight().reset(seed=99)
        assert np.array_equal(a, b)

    def test_encoded_obs_length(self):
        env = TwentyFortyEight(encoded=True)
        assert env.observation.shape == (4 * 4 * 31,)

    def test_normalized_reward_range(self):
        env = TwentyFortyEight(normalize=True)
        for _ in range(50):
            _, reward, done = env.step(np.random.randint(4))
            assert 0.0 <= reward <= 1.0
            if done:
                break

    def test_play_to_termination(self):
        env = TwentyFortyEight()
        env.reset(seed=5)
        rng = np.random.default_rng(0)
        for _ in range(5000):
            _, _, done = env.step(int(rng.integers(4)))
            if done:
                break
        assert env.is_finished


class TestVariableBoardSize:
    """The scalar engine (like the reference) supports arbitrary sizes."""

    def test_size_6_env_plays(self):
        env = TwentyFortyEight(size=6)
        obs = env.reset(seed=3)
        assert obs.shape == (6, 6) and (obs != 0).sum() == 2
        rng = np.random.default_rng(1)
        for _ in range(200):
            _, _, done = env.step(int(rng.integers(4)))
            if done:
                break
        assert env._current_state.shape == (6, 6)

    def test_size_3_merge_rules_hold(self):
        board = np.array([[2, 2, 2], [0, 0, 0], [0, 0, 0]])
        score, out = slide_and_merge(board)
        assert score == 4 and out[0].tolist() == [4, 2, 0]
