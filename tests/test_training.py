"""Training stack: value transform, losses, replay buffer, TD(λ) returns,
learner step, checkpoint round-trip — none of which the reference tests
(SURVEY.md §4)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.models import create_network
from simulate_2048_tpu.training import (
    TrainingTargets,
    Trajectory,
    add_trajectories,
    compute_loss,
    compute_n_step_returns,
    create_optimizer,
    create_train_state,
    init_buffer,
    inverse_scale_value,
    sample_batch,
    scale_value,
    tiny_config,
    train_step,
    update_priorities,
)
from simulate_2048_tpu.training.replay import get_statistics, trajectory_priority

CFG = tiny_config()


def make_trajectories(batch: int, length_each: int, cfg=CFG, seed: int = 0) -> Trajectory:
    t = cfg.max_trajectory_length
    rs = np.random.RandomState(seed)
    lengths = np.full(batch, length_each, np.int32)
    boards = rs.randint(0, 6, size=(batch, t + 1, 16)).astype(np.int8)
    return Trajectory(
        boards=jnp.asarray(boards),
        actions=jnp.asarray(rs.randint(0, 4, size=(batch, t)).astype(np.int8)),
        rewards=jnp.asarray(rs.rand(batch, t).astype(np.float32) * 4),
        policies=jnp.asarray(
            np.full((batch, t, 4), 0.25, np.float32)
        ),
        values=jnp.asarray(rs.rand(batch, t).astype(np.float32) * 10),
        priorities=jnp.asarray(rs.rand(batch, t).astype(np.float32) + 0.1),
        length=jnp.asarray(lengths),
        terminated=jnp.ones(batch, bool),
        total_reward=jnp.asarray(rs.rand(batch).astype(np.float32) * 100),
        max_tile=jnp.asarray(rs.choice([64, 128, 256], batch).astype(np.int32)),
    )


class TestValueTransform:
    def test_roundtrip(self):
        x = jnp.array([-1000.0, -1.0, 0.0, 0.5, 1.0, 100.0, 10000.0])
        np.testing.assert_allclose(
            np.asarray(inverse_scale_value(scale_value(x))), np.asarray(x), rtol=1e-3, atol=1e-3
        )

    def test_compression(self):
        assert float(scale_value(jnp.float32(10000.0))) < 120.0
        assert abs(float(scale_value(jnp.float32(0.0)))) < 1e-9


class TestLosses:
    @pytest.fixture(scope="class")
    def net(self):
        return create_network(jax.random.PRNGKey(0), hidden_size=16, num_blocks=1)

    def _batch(self, b=2, k=CFG.num_unroll_steps):
        rs = np.random.RandomState(1)
        return TrainingTargets(
            observations=jnp.asarray(rs.rand(b, k + 1, 16).astype(np.float32)),
            actions=jnp.asarray(rs.randint(0, 4, (b, k))),
            target_policies=jnp.asarray(np.full((b, k + 1, 4), 0.25, np.float32)),
            target_values=jnp.asarray(rs.rand(b, k + 1).astype(np.float32) * 50),
            target_rewards=jnp.asarray(rs.rand(b, k).astype(np.float32) * 4),
        )

    def test_loss_finite_and_positive(self, net):
        total, out = compute_loss(net.params, net.apply_fns, self._batch(), CFG)
        assert np.isfinite(float(total)) and float(total) > 0
        for v in out:
            assert np.isfinite(float(v))

    def test_encoder_mode_trains_commitment(self, net):
        cfg = replace(CFG, chance_target_mode="encoder")
        total, out = compute_loss(net.params, net.apply_fns, self._batch(), cfg)
        # encoder mode: chance loss targets real codes; commitment active.
        assert float(out.commitment_loss) >= 0.0
        # gradient flows into the encoder (the reference's never does).
        grads = jax.grad(
            lambda p: compute_loss(p, net.apply_fns, self._batch(), cfg)[0]
        )(net.params)
        enc_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads.encoder))
        assert enc_norm > 0.0

    def test_placeholder_mode_matches_reference_shape(self, net):
        cfg = replace(CFG, chance_target_mode="placeholder")
        total, out = compute_loss(net.params, net.apply_fns, self._batch(), cfg)
        assert np.isfinite(float(total))
        grads = jax.grad(
            lambda p: compute_loss(p, net.apply_fns, self._batch(), cfg)[0]
        )(net.params)
        enc_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads.encoder))
        assert enc_norm == 0.0  # encoder unused, as in the reference

    def test_is_weights_change_loss(self, net):
        b = self._batch(4)
        w = jnp.array([1.0, 0.1, 0.1, 0.1])
        t_uniform, _ = compute_loss(net.params, net.apply_fns, b, CFG)
        t_weighted, _ = compute_loss(net.params, net.apply_fns, b, CFG, w)
        assert float(t_uniform) != float(t_weighted)


class TestReplayBuffer:
    def test_add_and_stats(self):
        buf = init_buffer(CFG)
        buf = add_trajectories(buf, make_trajectories(8, 20))
        assert int(buf.size) == 8
        stats = get_statistics(buf)
        assert stats["episodes_added"] == 8
        assert stats["mean_episode_length"] == 20.0

    def test_circular_wraparound(self):
        cfg = replace(CFG, replay_buffer_size=10)
        buf = init_buffer(cfg)
        for i in range(3):
            buf = add_trajectories(buf, make_trajectories(6, 15, cfg, seed=i))
        assert int(buf.size) == 10
        assert int(buf.episodes_added) == 18
        assert int(buf.write_pos) == 8

    def test_sample_shapes_and_validity(self):
        buf = add_trajectories(init_buffer(CFG), make_trajectories(16, 30))
        batch, idx, weights = sample_batch(buf, jax.random.PRNGKey(0), 8, CFG)
        k = CFG.num_unroll_steps
        assert batch.observations.shape == (8, k + 1, 16)
        assert batch.actions.shape == (8, k)
        assert batch.target_policies.shape == (8, k + 1, 4)
        assert batch.target_values.shape == (8, k + 1)
        assert batch.target_rewards.shape == (8, k)
        assert weights.shape == (8,) and float(weights.max()) <= 1.0 + 1e-6
        # indices are (episode, start) pairs at position granularity.
        assert idx.shape == (8, 2)
        assert np.asarray(idx)[:, 0].max() < 16
        assert (np.asarray(idx)[:, 1] < 30).all()

    def test_beyond_terminal_masking(self):
        # length-1 episodes: every window crosses the terminal.
        buf = add_trajectories(init_buffer(CFG), make_trajectories(4, 1))
        batch, _, _ = sample_batch(buf, jax.random.PRNGKey(0), 4, CFG)
        # Steps ≥ length: value 0, reward 0, uniform policy.
        assert float(jnp.abs(batch.target_values[:, 1:]).max()) == 0.0
        assert float(jnp.abs(batch.target_rewards[:, 1:]).max()) == 0.0
        np.testing.assert_allclose(np.asarray(batch.target_policies[:, 1:]), 0.25)

    def test_priority_sampling_prefers_high_priority_position(self):
        # Paper App. C: sampling is at (episode, step) granularity — boost ONE
        # position and nearly all draws must land exactly on it.
        traj = make_trajectories(32, 10)
        traj = traj._replace(priorities=jnp.full_like(traj.priorities, 1e-3))
        buf = add_trajectories(init_buffer(CFG), traj)
        hot = jnp.array([[7, 3]], jnp.int32)  # (episode 7, step 3)
        buf = update_priorities(buf, hot, jnp.array([1e6]))
        _, idx, _ = sample_batch(buf, jax.random.PRNGKey(1), 64, CFG)
        idx = np.asarray(idx)
        assert ((idx[:, 0] == 7) & (idx[:, 1] == 3)).mean() > 0.9

    def test_is_weights_correct_high_priority_oversampling(self):
        # The oversampled hot position must carry the SMALLEST IS weight.
        traj = make_trajectories(8, 10)
        traj = traj._replace(priorities=jnp.ones_like(traj.priorities))
        buf = add_trajectories(init_buffer(CFG), traj)
        buf = update_priorities(buf, jnp.array([[2, 5]], jnp.int32), jnp.array([100.0]))
        _, idx, w = sample_batch(buf, jax.random.PRNGKey(2), 64, CFG)
        idx, w = np.asarray(idx), np.asarray(w)
        hot = (idx[:, 0] == 2) & (idx[:, 1] == 5)
        if hot.any() and (~hot).any():
            assert w[hot].max() < w[~hot].min()

    def test_trajectory_priority_reference_rule(self):
        traj = make_trajectories(4, 10)
        p = np.asarray(trajectory_priority(traj))
        assert (p >= 1.0).all()


class TestOracleChance:
    """Ground-truth chance codes (VERDICT item 2): 2048's spawn is observed,
    code = 2·cell + is_four over the 16×{2,4} = 32-outcome space."""

    def _window(self, spawn_cell=7, spawn_exp=1, action=0):
        """Build a K-step observation window with known spawns.

        Every step applies `action` to the previous board and places a spawn
        of `spawn_exp` at `spawn_cell` (assumed empty in the afterstate).
        """
        from simulate_2048_tpu.ops import board as board_ops

        k = CFG.num_unroll_steps
        board = jnp.zeros((4, 4), jnp.int32).at[0, 0].set(1).at[3, 3].set(2)
        boards = [board]
        for _ in range(k):
            after, _ = board_ops.apply_action(boards[-1], jnp.int32(action))
            flat = after.reshape(16)
            assert int(flat[spawn_cell]) == 0, "test setup: spawn cell must be empty"
            boards.append(flat.at[spawn_cell].set(spawn_exp).reshape(4, 4))
        obs = jnp.stack([b.reshape(16).astype(jnp.float32) / 16.0 for b in boards])
        actions = jnp.full((k,), action, jnp.int32)
        return obs, actions

    def test_recovers_known_spawn_codes(self):
        from simulate_2048_tpu.training.losses import oracle_chance_targets

        obs, actions = self._window(spawn_cell=7, spawn_exp=1)
        onehot, target, spawned = oracle_chance_targets(obs, actions, 32)
        assert np.asarray(spawned).all()
        np.testing.assert_array_equal(np.asarray(onehot).argmax(-1), 2 * 7 + 0)

        obs4, actions4 = self._window(spawn_cell=11, spawn_exp=2)
        onehot4, _, _ = oracle_chance_targets(obs4, actions4, 32)
        np.testing.assert_array_equal(np.asarray(onehot4).argmax(-1), 2 * 11 + 1)

    def test_no_spawn_is_masked(self):
        from simulate_2048_tpu.training.losses import oracle_chance_targets

        # Repeated identical boards (terminal padding / invalid move): the
        # board never changes, so no chance event exists.
        k = CFG.num_unroll_steps
        board = jnp.zeros((16,), jnp.float32).at[0].set(1.0 / 16.0)
        obs = jnp.tile(board, (k + 1, 1))
        _, _, spawned = oracle_chance_targets(obs, jnp.zeros((k,), jnp.int32), 32)
        assert not np.asarray(spawned).any()

    def test_exact_distribution_matches_spawn_law(self):
        from simulate_2048_tpu.ops import board as board_ops
        from simulate_2048_tpu.training.losses import oracle_chance_targets

        obs, actions = self._window(spawn_cell=7, spawn_exp=1)
        _, dist, spawned = oracle_chance_targets(obs, actions, 32, exact_dist=True)
        dist = np.asarray(dist)
        np.testing.assert_allclose(dist.sum(-1), 1.0, rtol=1e-5)
        # Check step 0 against the afterstate's empty-cell law.
        boards = np.asarray(jnp.round(obs * 16).astype(jnp.int32)).reshape(-1, 4, 4)
        after, _ = board_ops.apply_action(jnp.asarray(boards[0]), jnp.int32(0))
        empty = (np.asarray(after).reshape(16) == 0)
        n = empty.sum()
        expect = np.zeros(32)
        expect[0::2][empty] = 0.9 / n
        expect[1::2][empty] = 0.1 / n
        np.testing.assert_allclose(dist[0], expect, rtol=1e-5)

    def test_oracle_loss_trains_without_encoder(self):
        net = create_network(jax.random.PRNGKey(0), hidden_size=16, num_blocks=1)
        obs, actions = self._window()
        batch = TrainingTargets(
            observations=obs[None],
            actions=actions[None],
            target_policies=jnp.full((1, CFG.num_unroll_steps + 1, 4), 0.25),
            target_values=jnp.ones((1, CFG.num_unroll_steps + 1)),
            target_rewards=jnp.zeros((1, CFG.num_unroll_steps)),
        )
        cfg = replace(CFG, chance_target_mode="oracle")
        total, out = compute_loss(net.params, net.apply_fns, batch, cfg)
        assert np.isfinite(float(total)) and float(out.chance_loss) > 0
        grads = jax.grad(lambda p: compute_loss(p, net.apply_fns, batch, cfg)[0])(net.params)
        enc = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads.encoder))
        psi = sum(
            float(jnp.sum(jnp.abs(g)))
            for g in jax.tree.leaves(grads.afterstate_prediction)
        )
        assert enc == 0.0  # no encoder in the loop -> no collapse dynamics
        assert psi > 0.0  # chance CE reaches the afterstate-prediction net

    def test_oracle_rejects_small_codebook(self):
        with pytest.raises(ValueError):
            replace(CFG, codebook_size=16, chance_target_mode="oracle")


class TestBufferFootprint:
    def test_full_config_fits_budget(self):
        """Full-config (125k × 200) buffer must stay well under HBM pressure:
        compressed dtypes keep it < 0.85 GB (all-f32 would be ~1.45 GB with
        per-step priorities)."""
        from simulate_2048_tpu.training import default_config
        from simulate_2048_tpu.training.replay import init_buffer as _init

        cfg = default_config()
        shapes = jax.eval_shape(lambda: _init(cfg))
        nbytes = sum(
            int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            for leaf in jax.tree.leaves(shapes)
        )
        assert nbytes < 0.85 * 2**30, f"buffer footprint {nbytes/2**30:.2f} GiB"

    def test_dtype_roundtrip_precision(self):
        """Stored-dtype round-trip keeps targets within training tolerance."""
        buf = add_trajectories(init_buffer(CFG), make_trajectories(4, 30))
        batch, _, _ = sample_batch(buf, jax.random.PRNGKey(0), 16, CFG)
        assert batch.target_policies.dtype == jnp.float32
        assert batch.target_values.dtype == jnp.float32
        # policies stored f16: abs error < 1e-3 on probabilities.
        assert float(jnp.abs(batch.target_policies - 0.25).max()) < 1e-3
        # values stored bf16: rel error < 1% at these magnitudes.
        raw = np.asarray(buf.values[:4], np.float32)
        orig = np.asarray(make_trajectories(4, 30).values)
        rel = np.abs(raw - orig) / np.maximum(np.abs(orig), 1e-6)
        assert rel.max() < 0.01


class TestCollectionPriorities:
    def test_scaled_space_consistency_with_learner_refresh(self):
        """Collection-time priorities MUST live in the same h-scaled space as
        the learner's refresh (|v̂₀ − h(z₀)|): raw-space values of a ~2000-
        score game would be ~100× the refreshed ones, monopolizing sampling
        for the newest segments (observed as an eval collapse in the first
        round-2 soak)."""
        from simulate_2048_tpu.training.self_play import collection_priorities

        # Search values ~2000 with a large raw-space TD gap.
        values = jnp.full((2, 8), 2000.0)
        rewards = jnp.full((2, 8), 4.0)
        lengths = jnp.full((2,), 8, jnp.int32)
        terminated = jnp.ones((2,), bool)
        p = np.asarray(
            collection_priorities(rewards, values, lengths, CFG, terminated)
        )
        # h(2000) ≈ 45: scaled-space TD gaps are O(1..50), never O(raw).
        assert p.max() < 50.0
        assert (p >= 0).all()


class TestNStepReturns:
    def test_matches_manual_recursion(self):
        cfg = CFG
        rewards = jnp.array([[1.0, 2.0, 3.0, 0.0]])
        values = jnp.array([[0.5, 0.6, 0.7, 0.0]])
        lengths = jnp.array([3])
        g = np.asarray(compute_n_step_returns(rewards, values, lengths, cfg))[0]
        gamma, lam = cfg.discount, cfg.td_lambda
        g2 = 3.0  # terminal step: no bootstrap
        g1 = 2.0 + gamma * ((1 - lam) * 0.7 + lam * g2)
        g0 = 1.0 + gamma * ((1 - lam) * 0.6 + lam * g1)
        np.testing.assert_allclose(g[:3], [g0, g1, g2], rtol=1e-5)
        assert g[3] == 0.0  # beyond episode

    def test_truncated_boundary_bootstraps_full_search_value(self):
        # Segment ends mid-game: the last stored position's target is its own
        # search value ν_last — the FULL bootstrap, not γ(1−λ)ν (which would
        # shave λ of the tail mass at every segment boundary).
        cfg = CFG
        gamma, lam = cfg.discount, cfg.td_lambda
        rewards = jnp.array([[1.0, 2.0, 3.0, 99.0]])
        values = jnp.array([[0.5, 0.6, 10.0, 99.0]])
        lengths = jnp.array([3])
        terminated = jnp.array([False])
        g = np.asarray(
            compute_n_step_returns(rewards, values, lengths, cfg, terminated)
        )[0]
        g2 = 10.0  # ν_last verbatim
        g1 = 2.0 + gamma * ((1 - lam) * 10.0 + lam * g2)  # = 2 + γ·10
        g0 = 1.0 + gamma * ((1 - lam) * 0.6 + lam * g1)
        np.testing.assert_allclose(g[:3], [g0, g1, g2], rtol=1e-5)
        assert g[3] == 0.0

    def test_cross_segment_backfill_matches_joint_return(self):
        # Patching a truncated segment's targets with its successor must equal
        # the TD(λ) recursion computed jointly over the concatenated game —
        # the boundary perturbation re-enters earlier positions only through
        # the λ-branch, so the closed-form (γλ)^{L-1-t} shift is exact.
        from simulate_2048_tpu.training import replay as replay_lib

        cfg = replace(CFG, max_trajectory_length=6, replay_buffer_size=8)
        t = cfg.max_trajectory_length
        rng = np.random.RandomState(3)
        r1 = rng.uniform(0, 8, (1, t)).astype(np.float32)
        v1 = rng.uniform(0, 5, (1, t)).astype(np.float32)
        r2 = rng.uniform(0, 8, (1, t)).astype(np.float32)
        v2 = rng.uniform(0, 5, (1, t)).astype(np.float32)
        z1 = compute_n_step_returns(
            jnp.asarray(r1), jnp.asarray(v1), jnp.array([t]), cfg, jnp.array([False])
        )
        z2 = compute_n_step_returns(
            jnp.asarray(r2), jnp.asarray(v2), jnp.array([t]), cfg, jnp.array([True])
        )
        joint = compute_n_step_returns(
            jnp.concatenate([jnp.asarray(r1), jnp.asarray(r2)], axis=1),
            jnp.concatenate([jnp.asarray(v1), jnp.asarray(v2)], axis=1),
            jnp.array([2 * t]),
            cfg,
            jnp.array([True]),
        )

        traj = Trajectory(
            boards=jnp.zeros((1, t + 1, 16), jnp.int8),
            actions=jnp.zeros((1, t), jnp.int8),
            rewards=jnp.asarray(r1),
            policies=jnp.full((1, t, 4), 0.25),
            values=z1,
            priorities=jnp.ones((1, t)),
            length=jnp.array([t]),
            terminated=jnp.array([False]),
            total_reward=jnp.asarray(r1.sum(1)),
            max_tile=jnp.array([64]),
        )
        buf = replay_lib.add_trajectories(replay_lib.init_buffer(cfg), traj)
        buf = replay_lib.backfill_returns(
            buf,
            slots=jnp.array([0]),
            cont=jnp.array([True]),
            seq=jnp.array([0]),
            nu0_next=jnp.asarray(v2[:, 0]),
            z0_next=z2[:, 0],
            config=cfg,
        )
        patched = np.asarray(buf.values[0, :t], np.float32)
        # bf16 storage: ~3 significant digits.
        np.testing.assert_allclose(patched, np.asarray(joint)[0, :t], rtol=2e-2)
        # Stale rows (overwritten since) must be left untouched.
        buf2 = replay_lib.backfill_returns(
            buf,
            slots=jnp.array([0]),
            cont=jnp.array([True]),
            seq=jnp.array([-cfg.replay_buffer_size - 1]),
            nu0_next=jnp.array([999.0]),
            z0_next=jnp.array([999.0]),
            config=cfg,
        )
        np.testing.assert_array_equal(np.asarray(buf2.values[0]), np.asarray(buf.values[0]))


class TestLearner:
    def test_train_step_reduces_loss_and_updates(self):
        cfg = replace(CFG, hidden_size=16, num_residual_blocks=1, batch_size=4)
        state, network = create_train_state(jax.random.PRNGKey(0), cfg)
        optimizer = create_optimizer(cfg)
        rs = np.random.RandomState(0)
        k = cfg.num_unroll_steps
        batch = TrainingTargets(
            observations=jnp.asarray(rs.rand(4, k + 1, 16).astype(np.float32)),
            actions=jnp.asarray(rs.randint(0, 4, (4, k))),
            target_policies=jnp.asarray(np.full((4, k + 1, 4), 0.25, np.float32)),
            target_values=jnp.asarray(rs.rand(4, k + 1).astype(np.float32)),
            target_rewards=jnp.asarray(rs.rand(4, k).astype(np.float32)),
        )
        losses = []
        for _ in range(5):
            state, loss_output, priorities = train_step(
                state, network.apply_fns, batch, None, cfg, optimizer
            )
            losses.append(float(loss_output.total_loss))
        assert int(state.step) == 5
        assert losses[-1] < losses[0]
        assert priorities.shape == (4,) and (np.asarray(priorities) > 0).all()


class TestCheckpoint:
    def test_full_roundtrip_including_opt_state(self, tmp_path):
        from simulate_2048_tpu.training import CheckpointManager

        cfg = replace(CFG, hidden_size=16, num_residual_blocks=1)
        state, network = create_train_state(jax.random.PRNGKey(0), cfg)
        state = state._replace(step=jnp.int32(123))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state)
        assert mgr.latest_step() == 123

        fresh, _ = create_train_state(jax.random.PRNGKey(1), cfg)
        restored = mgr.restore(fresh)
        assert int(restored.step) == 123
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Optimizer state round-trips too (reference re-inits it).
        for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_config_sidecar_roundtrip(self, tmp_path):
        """save_config → load_train_config rebuilds the EXACT TrainConfig,
        including tuple-typed and None fields and model-shape overrides —
        so the eval CLI can evaluate a checkpoint trained with --set
        overrides (e.g. categorical heads) without guessing the preset."""
        from simulate_2048_tpu.training import CheckpointManager
        from simulate_2048_tpu.training.checkpoint import load_train_config

        cfg = replace(
            CFG,
            hidden_size=16,
            value_bins=64,
            reward_bins=32,
            eval_prior_temperature=4.0,
            eval_pb_c_init=0.5,
            temperature_schedule=((0, 1.0), (500, 0.5)),
            lr_decay_steps=None,
        )
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save_config(cfg)
        mgr.close()
        loaded = load_train_config(str(tmp_path / "ckpt"))
        assert loaded == cfg
        assert load_train_config(str(tmp_path / "empty")) is None

    def test_runtime_resume_restores_gen_state_and_backfill(self, tmp_path):
        """A resumed trainer continues the in-flight games and keeps the
        pending cross-segment-backfill rows (VERDICT r2 #7): the bookkeeping
        must survive the save/restore boundary and the backfill must still
        fire on the next ingested segment."""
        from simulate_2048_tpu.training import Trainer

        cfg = replace(
            CFG,
            hidden_size=16,
            num_residual_blocks=1,
            num_simulations=2,
            max_trajectory_length=8,
            min_buffer_size=2,
            num_parallel_games=2,
            replay_buffer_size=16,
            checkpoint_buffer=True,
            cross_segment_backfill=True,
            value_target_mode="td_lambda",
            td_lambda=1.0,
        )
        ckdir = str(tmp_path / "ck")
        tr = Trainer(cfg, checkpoint_dir=ckdir)
        tr.initialize()
        tr.fill_buffer(verbose=False)
        assert tr._prev_slots is not None  # a generation ran
        tr._ckpt.save(tr.state, buffer=tr.buffer, runtime=tr._runtime_payload())
        prev_slots = np.asarray(tr._prev_slots)
        prev_cont = np.asarray(tr._prev_cont)
        gen_board = np.asarray(tr.gen_state.board)
        tr._ckpt.close()

        tr2 = Trainer(cfg, checkpoint_dir=ckdir)
        tr2.initialize()
        assert tr2._prev_slots is not None
        np.testing.assert_array_equal(np.asarray(tr2._prev_slots), prev_slots)
        np.testing.assert_array_equal(np.asarray(tr2._prev_cont), prev_cont)
        np.testing.assert_array_equal(np.asarray(tr2.gen_state.board), gen_board)

        if prev_cont.any():
            # The pending backfill fires: ingesting the next segment patches
            # the continuing games' previous rows in the restored buffer.
            from simulate_2048_tpu.training.self_play import generate_games

            before = np.asarray(
                tr2.buffer.values[prev_slots[prev_cont]], np.float32
            ).copy()
            tr2.gen_state, traj, stats = generate_games(
                tr2.state.params,
                tr2.network.apply_fns,
                jax.random.PRNGKey(9),
                cfg,
                0,
                env_state=tr2.gen_state,
            )
            tr2._ingest(traj, stats)
            after = np.asarray(tr2.buffer.values[prev_slots[prev_cont]], np.float32)
            assert not np.array_equal(before, after)
        tr2._ckpt.close()


class TestEncoderNoise:
    def test_gumbel_noise_diversifies_targets(self):
        """With noise, the chance-code targets vary across keys; without, they
        are deterministic."""
        net = create_network(jax.random.PRNGKey(0), hidden_size=16, num_blocks=1)
        from simulate_2048_tpu.training.losses import _encode_chance

        obs = jnp.zeros((8, 16))  # identical observations -> identical codes
        _, hot_a, _ = _encode_chance(net.params, net.apply_fns, obs, 0.0, None)
        _, hot_b, _ = _encode_chance(net.params, net.apply_fns, obs, 0.0, None)
        np.testing.assert_array_equal(np.asarray(hot_a), np.asarray(hot_b))
        assert len(np.unique(np.asarray(hot_a).argmax(-1))) == 1

        _, hot_n1, _ = _encode_chance(net.params, net.apply_fns, obs, 5.0, jax.random.PRNGKey(1))
        _, hot_n2, _ = _encode_chance(net.params, net.apply_fns, obs, 5.0, jax.random.PRNGKey(2))
        ids1 = np.asarray(hot_n1).argmax(-1)
        ids2 = np.asarray(hot_n2).argmax(-1)
        assert len(np.unique(np.concatenate([ids1, ids2]))) > 1

    def test_loss_runs_with_noise(self):
        net = create_network(jax.random.PRNGKey(0), hidden_size=16, num_blocks=1)
        cfg = replace(CFG, chance_target_mode="encoder", encoder_noise_scale=1.0)
        rs = np.random.RandomState(1)
        k = cfg.num_unroll_steps
        batch = TrainingTargets(
            observations=jnp.asarray(rs.rand(2, k + 1, 16).astype(np.float32)),
            actions=jnp.asarray(rs.randint(0, 4, (2, k))),
            target_policies=jnp.asarray(np.full((2, k + 1, 4), 0.25, np.float32)),
            target_values=jnp.asarray(rs.rand(2, k + 1).astype(np.float32)),
            target_rewards=jnp.asarray(rs.rand(2, k).astype(np.float32)),
        )
        total, out = compute_loss(
            net.params, net.apply_fns, batch, cfg, None, jax.random.PRNGKey(3)
        )
        assert np.isfinite(float(total))


class TestAfterstateValueLoss:
    """Paper Eq. 5 trains ψ's Q toward z; the reference leaves the Q head at
    random init while search backs it up into every chance node."""

    def test_q_head_trains_only_when_weighted(self):
        from simulate_2048_tpu.training import train_step
        from simulate_2048_tpu.training.replay import init_buffer, sample_batch

        def q_head_leaves(params):
            return jax.tree.leaves(
                params.afterstate_prediction["params"]["q_value"]
            )

        for weight, expect_change in ((0.0, False), (0.25, True)):
            cfg = replace(
                CFG,
                hidden_size=16,
                num_residual_blocks=1,
                batch_size=8,
                warmup_steps=0,  # LR ramps from 0 — step 0 would be a no-op
                afterstate_value_loss_weight=weight,
            )
            state, network = create_train_state(jax.random.PRNGKey(0), cfg)
            before = [np.asarray(x).copy() for x in q_head_leaves(state.params)]
            buf = add_trajectories(init_buffer(cfg), make_trajectories(4, 8, cfg))
            batch, _, _ = sample_batch(buf, jax.random.PRNGKey(1), 8, cfg)
            optimizer = create_optimizer(cfg)
            new_state, loss_output, _ = train_step(
                state, network.apply_fns, batch, None, cfg, optimizer
            )
            after = q_head_leaves(new_state.params)
            changed = any(
                not np.array_equal(b, np.asarray(a)) for b, a in zip(before, after)
            )
            assert changed == expect_change, f"weight={weight}"
            assert float(loss_output.afterstate_value_loss) > 0  # logged either way


class TestDeepEval:
    """Deep evaluation at decision points (VERDICT r3 weak #4): n-game full
    eval logged under deep_eval/, with champion selection by deep eval into a
    best/ checkpoint."""

    def test_deep_eval_logs_and_keeps_best_checkpoint(self, tmp_path):
        import dataclasses
        import json
        import os

        from simulate_2048_tpu.training import CheckpointManager
        from simulate_2048_tpu.training.checkpoint import load_train_config
        from simulate_2048_tpu.training.trainer import Trainer

        cfg = dataclasses.replace(
            tiny_config(),
            hidden_size=16,
            num_residual_blocks=1,
            num_simulations=2,
            min_buffer_size=2,
            num_parallel_games=2,
            batch_size=8,
            generation_interval=5,
            log_interval=5,
            eval_interval=1_000_000,
            checkpoint_interval=5,
            deep_eval_interval=5,
            deep_eval_games=2,
            eval_max_moves=12,
        )
        ckdir = str(tmp_path / "ck")
        tr = Trainer(cfg, checkpoint_dir=ckdir, seed=0)
        tr.initialize()
        tr.fill_buffer(verbose=False)
        tr.train(num_steps=10, verbose=False)

        rows = [r for r in tr.metrics.history if "deep_eval/mean_reward" in r]
        assert len(rows) == 2
        assert all("deep_eval/sem_reward" in r for r in rows)

        best = json.load(open(os.path.join(ckdir, "deep_eval_best.json")))
        assert best["games"] == 2
        assert best["step"] in (5, 10)
        assert tr._best_deep_eval is not None
        assert best["mean_reward"] == pytest.approx(tr._best_deep_eval[0])
        # The best/ checkpoint restores with the run's config.
        best_mgr = CheckpointManager(os.path.join(ckdir, "best"))
        assert best_mgr.latest_step() == best["step"]
        assert load_train_config(os.path.join(ckdir, "best")) == cfg

    def test_deep_eval_is_seed_matched_across_rng_cursor(self):
        """VERDICT r4 weak #3: deep evals must play the SAME games at every
        checkpoint. The key derives from (config seed, fixed salt), not the
        trainer's RNG cursor, so a second call after arbitrary cursor
        movement reproduces identical per-game results."""
        import dataclasses

        from simulate_2048_tpu.training.trainer import Trainer

        cfg = dataclasses.replace(
            tiny_config(),
            hidden_size=16,
            num_residual_blocks=1,
            num_simulations=2,
            num_parallel_games=2,
            deep_eval_games=2,
            eval_max_moves=8,
        )
        tr = Trainer(cfg, seed=0)
        tr.initialize()
        first = tr.deep_evaluate(step=1, verbose=False)
        for _ in range(7):  # move the cursor the way intervening training would
            tr._next_key()
        second = tr.deep_evaluate(step=2, verbose=False)
        assert first["mean_reward"] == second["mean_reward"]
        assert first["max_tile"] == second["max_tile"]
        # The inline eval stays fresh-seed: its key comes off the cursor.
        inline_a = tr.evaluate(2)
        inline_b = tr.evaluate(2)
        # (Not asserting inequality of rewards — tiny games can tie — but the
        # cursor must have advanced.)
        assert inline_a is not inline_b


class TestApplyOverrides:
    """Typed --set coercion shared by the train/eval CLIs (ADVICE r3)."""

    def test_coerces_against_declared_types(self):
        from simulate_2048_tpu.training.config import apply_overrides

        cfg = apply_overrides(
            tiny_config(),
            [
                "use_bfloat16=true",  # lowercase bool string -> bool
                "lr_decay_steps=60000",  # int | None
                "eval_prior_temperature=4",  # int literal -> float field
                "reanalyze_interval=None",
                "chance_target_mode=oracle",  # bare string
                "temperature_schedule=[[0,1.0],[5000,0.5]]",  # list -> tuple
            ],
        )
        assert cfg.use_bfloat16 is True
        assert cfg.lr_decay_steps == 60000
        assert cfg.eval_prior_temperature == 4.0
        assert isinstance(cfg.eval_prior_temperature, float)
        assert cfg.reanalyze_interval is None
        assert cfg.temperature_schedule == ((0, 1.0), (5000, 0.5))

    def test_uncoercible_values_error_with_field_name(self):
        from simulate_2048_tpu.training.config import apply_overrides

        for bad, frag in [
            ("use_bfloat16=maybe", "use_bfloat16"),
            ("lr_decay_steps=abc", "lr_decay_steps"),
            ("no_such_field=3", "no_such_field"),
            ("batch_size=None", "batch_size"),
        ]:
            with pytest.raises(ValueError, match=frag):
                apply_overrides(tiny_config(), [bad])

    def test_best_deep_eval_survives_resume(self, tmp_path):
        """Champion-selection state rides in the runtime payload: a resumed
        trainer must NOT reset the deep-eval bar (the round-5 wedge-resume
        overwrote a stronger champion with the first post-resume eval —
        docs/project.md round-5 champion notes)."""
        import dataclasses

        from simulate_2048_tpu.training.trainer import Trainer

        cfg = dataclasses.replace(
            tiny_config(),
            hidden_size=16,
            num_residual_blocks=1,
            num_simulations=2,
            min_buffer_size=2,
            num_parallel_games=2,
            batch_size=8,
            generation_interval=5,
            log_interval=5,
            eval_interval=1_000_000,
            checkpoint_interval=5,
            deep_eval_interval=5,
            deep_eval_games=2,
            eval_max_moves=12,
        )
        ckdir = str(tmp_path / "ck")
        tr = Trainer(cfg, checkpoint_dir=ckdir, seed=0)
        tr.initialize()
        tr.fill_buffer(verbose=False)
        tr.train(num_steps=5, verbose=False)
        assert tr._best_deep_eval is not None
        best = tr._best_deep_eval

        tr2 = Trainer(cfg, checkpoint_dir=ckdir, seed=0)
        tr2.initialize()
        assert tr2._best_deep_eval is not None
        assert tr2._best_deep_eval[0] == pytest.approx(best[0])
        assert tr2._best_deep_eval[1] == best[1]

    def test_legacy_runtime_payload_resumes(self, tmp_path):
        """Checkpoints written before the champion-selection keys existed
        must still restore their full runtime payload via the legacy-template
        fallback (not silently drop games/backfill/cursor)."""
        import dataclasses

        from simulate_2048_tpu.training.trainer import Trainer

        cfg = dataclasses.replace(
            tiny_config(),
            hidden_size=16,
            num_residual_blocks=1,
            num_simulations=2,
            min_buffer_size=2,
            num_parallel_games=2,
            batch_size=8,
            generation_interval=5,
            log_interval=5,
            eval_interval=1_000_000,
            checkpoint_interval=5,
        )
        ckdir = str(tmp_path / "ck")
        tr = Trainer(cfg, checkpoint_dir=ckdir, seed=0)
        tr.initialize()
        tr.fill_buffer(verbose=False)
        # Write a LEGACY-shaped checkpoint (pre-round-5 payload keys).
        legacy_keys = ("has_best_deep_eval", "best_deep_eval_mean", "best_deep_eval_step")
        payload = {k: v for k, v in tr._runtime_payload().items() if k not in legacy_keys}
        tr._ckpt.save(tr.state, runtime=payload)  # save() waits internally

        tr2 = Trainer(cfg, checkpoint_dir=ckdir, seed=0)
        tr2.initialize()
        # gen_state restored (not freshly reseeded): boards match exactly.
        import numpy as np

        np.testing.assert_array_equal(
            np.asarray(tr2.gen_state.board), np.asarray(tr.gen_state.board)
        )
        assert tr2._best_deep_eval is None
