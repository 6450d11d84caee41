"""On-device self-play: trajectory validity, policy-target semantics, greedy
eval, and a micro end-to-end trainer loop."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.engine import moves as nm
from simulate_2048_tpu.ops import board as ops
from simulate_2048_tpu.training import (
    Trainer,
    create_train_state,
    evaluate_games,
    play_games,
    tiny_config,
)

CFG = replace(
    tiny_config(),
    hidden_size=16,
    num_residual_blocks=1,
    num_simulations=4,
    max_trajectory_length=12,
    min_buffer_size=4,
    num_parallel_games=2,
    batch_size=8,
    replay_buffer_size=32,
)


@pytest.fixture(scope="module")
def setup():
    state, network = create_train_state(jax.random.PRNGKey(0), CFG)
    return state, network


class TestPlayGames:
    def test_trajectory_consistency(self, setup):
        state, network = setup
        traj = play_games(
            state.params, network.apply_fns, jax.random.PRNGKey(1), jnp.float32(1.0), CFG, 3, False
        )
        t = CFG.max_trajectory_length
        assert traj.boards.shape == (3, t + 1, 16)
        assert traj.actions.shape == (3, t)
        assert traj.policies.shape == (3, t, 4)
        lengths = np.asarray(traj.length)
        assert (lengths > 0).all() and (lengths <= t).all()

        # Policies on active steps are distributions; padding is zero.
        pol = np.asarray(traj.policies)
        for g in range(3):
            n = lengths[g]
            np.testing.assert_allclose(pol[g, :n].sum(-1), 1.0, rtol=1e-4)
            assert np.abs(pol[g, n:]).sum() == 0.0

        # total_reward equals the sum of recorded step rewards.
        np.testing.assert_allclose(
            np.asarray(traj.rewards).sum(-1), np.asarray(traj.total_reward), rtol=1e-5
        )

    def test_replay_of_recorded_transitions(self, setup):
        """Board tape must obey the engine: board[t+1] is reachable from
        board[t] by the recorded action (differential vs scalar engine)."""
        state, network = setup
        traj = play_games(
            state.params, network.apply_fns, jax.random.PRNGKey(2), jnp.float32(1.0), CFG, 2, False
        )
        boards = np.asarray(traj.boards, dtype=np.int64)
        for g in range(2):
            n = int(traj.length[g])
            for t in range(min(n, 6)):
                before = (2**boards[g, t].reshape(4, 4)) * (boards[g, t].reshape(4, 4) > 0)
                action = int(traj.actions[g, t])
                # recorded action must be legal on the recorded board
                assert nm.legal_actions_mask(before)[action], (g, t)

    def test_greedy_eval_runs(self, setup):
        state, network = setup
        stats = evaluate_games(state.params, network.apply_fns, jax.random.PRNGKey(3), CFG, 2)
        assert stats["mean_reward"] >= 0
        assert stats["max_tile"] >= 4
        assert "reached_2048" in stats


class TestTrainerLoop:
    def test_micro_end_to_end(self, tmp_path):
        trainer = Trainer(CFG, checkpoint_dir=None, log_dir=str(tmp_path), seed=0)
        trainer.initialize()
        trainer.fill_buffer(verbose=False)
        assert int(trainer.buffer.size) >= CFG.min_buffer_size
        out = trainer.train(num_steps=3, verbose=False)
        assert int(trainer.state.step) == 3
        assert np.isfinite(out["total_loss"])
        stats = trainer.get_buffer_stats()
        assert stats["episodes_added"] >= CFG.min_buffer_size
        # metrics JSONL written
        assert (tmp_path / "metrics.jsonl").exists()
