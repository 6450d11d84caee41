"""Reanalyze target refresh (training/reanalyze.py): TD(λ) re-bootstrap
semantics, search-mode policy rewrite, occupancy guards, round-robin cursor,
and trainer integration. The reference has no counterpart (targets frozen at
collection, ``replay_buffer.py:361`` uncalled)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.ops.value_transform import inverse_scale_value
from simulate_2048_tpu.training import (
    Trajectory,
    add_trajectories,
    compute_n_step_returns,
    create_train_state,
    init_buffer,
    reanalyze_pass,
    reanalyze_slots,
    tiny_config,
)

CFG = replace(
    tiny_config(),
    hidden_size=16,
    num_residual_blocks=1,
    num_simulations=4,
    max_trajectory_length=10,
    replay_buffer_size=16,
    value_target_mode="td_lambda",
    reanalyze_episodes=4,
)


@pytest.fixture(scope="module")
def net():
    state, network = create_train_state(jax.random.PRNGKey(0), CFG)
    return state, network


def make_buffer(cfg, batch=6, length=None, terminated=True, seed=0):
    t = cfg.max_trajectory_length
    rs = np.random.RandomState(seed)
    lengths = np.full(batch, length if length is not None else t, np.int32)
    traj = Trajectory(
        boards=jnp.asarray(rs.randint(1, 6, (batch, t + 1, 16)).astype(np.int8)),
        actions=jnp.asarray(rs.randint(0, 4, (batch, t)).astype(np.int8)),
        rewards=jnp.asarray((rs.rand(batch, t) * 4).astype(np.float32)),
        policies=jnp.full((batch, t, 4), 0.25),
        values=jnp.asarray((rs.rand(batch, t) * 10).astype(np.float32)),
        priorities=jnp.ones((batch, t), jnp.float32),
        length=jnp.asarray(lengths),
        terminated=jnp.full((batch,), terminated, bool),
        total_reward=jnp.asarray(rs.rand(batch).astype(np.float32)),
        max_tile=jnp.full((batch,), 64, jnp.int32),
    )
    return add_trajectories(init_buffer(cfg), traj), traj


def fresh_f_values(state, network, boards_i8, cfg):
    obs = np.asarray(boards_i8, np.float32) / 16.0
    flat = jnp.asarray(obs.reshape(-1, 16))
    hidden = network.apply_fns.representation(state.params.representation, flat)
    _, v = network.apply_fns.prediction(state.params.prediction, hidden)
    v = inverse_scale_value(v, cfg.value_epsilon)
    return np.asarray(v, np.float32).reshape(obs.shape[:-1])


class TestValueMode:
    def test_terminated_lambda1_targets_invariant(self, net):
        """λ=1 MC targets on terminated episodes use no bootstrap — a value
        reanalyze must reproduce them (up to storage precision)."""
        state, network = net
        cfg = replace(CFG, td_lambda=1.0)
        buf, traj = make_buffer(cfg, terminated=True)
        mc = compute_n_step_returns(
            traj.rewards, traj.values, traj.length, cfg, traj.terminated
        )
        buf = buf._replace(values=buf.values.at[: mc.shape[0]].set(mc.astype(buf.values.dtype)))
        out = reanalyze_slots(
            buf, state.params, network.apply_fns, jnp.arange(6, dtype=jnp.int32), cfg
        )
        np.testing.assert_allclose(
            np.asarray(out.values[:6], np.float32),
            np.asarray(mc, np.float32),
            rtol=0.02,  # bf16 storage round-trip
            atol=0.1,
        )

    def test_truncated_matches_manual_fresh_recursion(self, net):
        """Truncated segments: new targets must equal the TD(λ) recursion run
        on FRESH f-values with the r_last + γ·v̂(closing board) boundary."""
        state, network = net
        cfg = replace(CFG, td_lambda=0.5)
        buf, traj = make_buffer(cfg, terminated=False)
        out = reanalyze_slots(
            buf, state.params, network.apply_fns, jnp.arange(6, dtype=jnp.int32), cfg
        )

        t = cfg.max_trajectory_length
        v_fresh = fresh_f_values(state, network, np.asarray(traj.boards), cfg)  # (6, T+1)
        got = np.asarray(out.values[:6], np.float32)
        gamma, lam = cfg.discount, cfg.td_lambda
        for b in range(6):
            rewards = np.asarray(traj.rewards[b], np.float32)
            expect = np.zeros(t, np.float32)
            expect[t - 1] = rewards[t - 1] + gamma * v_fresh[b, t]
            for i in range(t - 2, -1, -1):
                expect[i] = rewards[i] + gamma * (
                    (1 - lam) * v_fresh[b, i + 1] + lam * expect[i + 1]
                )
            np.testing.assert_allclose(got[b], expect, rtol=0.02, atol=0.5)

    def test_priorities_refreshed_and_masked(self, net):
        state, network = net
        cfg = replace(CFG, td_lambda=0.5)
        buf, _ = make_buffer(cfg, length=6, terminated=True)
        out = reanalyze_slots(
            buf, state.params, network.apply_fns, jnp.arange(6, dtype=jnp.int32), cfg
        )
        prios = np.asarray(out.step_priorities[:6], np.float32)
        assert (prios[:, :6] >= 1e-3).all()  # in-episode floored
        assert (prios[:, 6:] == 0).all()  # padding unsampleable

    def test_unoccupied_rows_untouched(self, net):
        state, network = net
        cfg = CFG
        buf, _ = make_buffer(cfg, batch=3)
        before_vals = np.asarray(buf.values, np.float32).copy()
        slots = jnp.asarray([0, 1, 2, 7, 9], jnp.int32)  # 7, 9 never written
        out = reanalyze_slots(buf, state.params, network.apply_fns, slots, cfg)
        after_vals = np.asarray(out.values, np.float32)
        np.testing.assert_array_equal(after_vals[7], before_vals[7])
        np.testing.assert_array_equal(after_vals[9], before_vals[9])
        assert not np.array_equal(after_vals[0], before_vals[0])


class TestSearchMode:
    def test_policies_rewritten_as_distributions(self, net):
        state, network = net
        cfg = replace(CFG, reanalyze_mode="search", reanalyze_num_simulations=2)
        buf, traj = make_buffer(cfg, length=5, terminated=True)
        out = reanalyze_slots(
            buf,
            state.params,
            network.apply_fns,
            jnp.arange(6, dtype=jnp.int32),
            cfg,
            jax.random.PRNGKey(3),
        )
        pols = np.asarray(out.policies[:6], np.float32)
        # In-episode rows are fresh MCTS visit distributions...
        np.testing.assert_allclose(pols[:, :5].sum(-1), 1.0, atol=1e-2)
        assert not np.allclose(pols[:, :5], 0.25, atol=1e-4)
        # ...padding stays zeroed.
        assert (pols[:, 5:] == 0).all()
        assert np.isfinite(np.asarray(out.values[:6], np.float32)).all()


class TestPassCursor:
    def test_round_robin_wraps_over_occupied(self, net):
        state, network = net
        cfg = replace(CFG, reanalyze_episodes=4)
        buf, _ = make_buffer(cfg, batch=6)
        buf, cur = reanalyze_pass(buf, state.params, network.apply_fns, 0, cfg)
        assert cur == 4
        buf, cur = reanalyze_pass(buf, state.params, network.apply_fns, cur, cfg)
        assert cur == (4 + 4) % 6
        # Empty buffer: no-op.
        empty = init_buffer(cfg)
        _, cur0 = reanalyze_pass(empty, state.params, network.apply_fns, 0, cfg)
        assert cur0 == 0


class TestTrainerIntegration:
    def test_reanalyze_runs_inside_training_loop(self):
        from simulate_2048_tpu.training import Trainer

        cfg = replace(
            CFG,
            num_simulations=2,
            min_buffer_size=2,
            num_parallel_games=2,
            batch_size=8,
            max_trajectory_length=8,
            log_interval=2,
            generation_interval=4,
            checkpoint_interval=100,
            eval_interval=100,
            eval_games=2,
            eval_max_moves=10,
            reanalyze_interval=2,
            reanalyze_episodes=2,
            td_lambda=1.0,
        )
        tr = Trainer(cfg)
        tr.initialize()
        tr.fill_buffer(verbose=False)
        tr.train(num_steps=4, verbose=False)
        assert tr._reanalyze_cursor > 0  # passes actually ran


class TestReanalyzeCalibration:
    def test_calibration_knobs_reach_search_and_change_targets(self, net):
        state, network = net
        base = replace(CFG, reanalyze_mode="search", reanalyze_num_simulations=4)
        calib = replace(
            base, reanalyze_prior_temperature=4.0, reanalyze_pb_c_init=0.5
        )
        slots = jnp.arange(4, dtype=jnp.int32)
        key = jax.random.PRNGKey(11)
        # reanalyze_slots donates its buffer — build one per call.
        buf_a, _ = make_buffer(base, length=6, terminated=True, seed=3)
        out_a = reanalyze_slots(buf_a, state.params, network.apply_fns, slots, base, key)
        buf_b, _ = make_buffer(base, length=6, terminated=True, seed=3)
        out_b = reanalyze_slots(buf_b, state.params, network.apply_fns, slots, calib, key)
        # Same key, different search calibration → different visit targets.
        assert not np.allclose(
            np.asarray(out_a.policies[:4], np.float32),
            np.asarray(out_b.policies[:4], np.float32),
        )
