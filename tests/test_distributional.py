"""Categorical (two-hot) value/reward heads: encoding invariants, the
scalar-facing apply-fn contract, loss gating, search compatibility, and an
end-to-end train step. The reference has scalar MSE heads only
(``reinforce/training/losses.py:134-177``) and hence no counterpart tests."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from simulate_2048_tpu.models import create_network
from simulate_2048_tpu.ops import distributional as dist
from simulate_2048_tpu.training import (
    create_optimizer,
    create_train_state,
    scale_value,
    tiny_config,
    train_step,
)
from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.replay import add_trajectories, init_buffer, sample_batch

from tests.test_training import make_trajectories

BINS, VMAX = 33, 320.0


class TestTwoHot:
    def test_expectation_roundtrip(self):
        """two_hot's expectation reproduces the (clipped) input exactly."""
        x = jnp.array([0.0, 0.37, 1.0, 55.5, VMAX - 1e-3, VMAX, VMAX + 50.0])
        probs = dist.two_hot(x, BINS, VMAX)
        atoms = dist.support_atoms(BINS, VMAX)
        np.testing.assert_allclose(
            np.asarray(probs @ atoms), np.asarray(jnp.clip(x, 0, VMAX)), rtol=1e-5, atol=1e-4
        )

    def test_valid_distribution(self):
        x = jnp.linspace(-5.0, VMAX + 30, 64)
        probs = dist.two_hot(x, BINS, VMAX)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-6)
        assert float(probs.min()) >= 0.0
        # At most two atoms carry mass.
        assert int(jnp.max(jnp.sum(probs > 1e-6, axis=-1))) <= 2

    def test_loss_minimized_at_target(self):
        """CE(logits, x) is smaller for logits matching x than for any shift."""
        x = jnp.float32(100.0)
        sharp = 50.0 * jnp.log(dist.two_hot(x, BINS, VMAX) + 1e-9)
        on = float(dist.categorical_loss(sharp, x, VMAX))
        off = float(dist.categorical_loss(jnp.roll(sharp, 3), x, VMAX))
        assert on < off

    def test_expectation_of_logits(self):
        logits = jnp.zeros((4, BINS))  # uniform → expectation = support mean
        np.testing.assert_allclose(
            np.asarray(dist.expectation(logits, VMAX)), VMAX / 2, rtol=1e-5
        )


def _cat_cfg(**kw) -> TrainConfig:
    return replace(
        tiny_config(),
        hidden_size=16,
        num_residual_blocks=1,
        batch_size=8,
        warmup_steps=0,
        value_bins=BINS,
        reward_bins=17,
        **kw,
    )


class TestCategoricalNetwork:
    def test_scalar_api_is_expectation(self):
        """The scalar-facing apply fns equal expectation(logit fns) — search,
        eval and priorities stay head-agnostic."""
        net = create_network(
            jax.random.PRNGKey(0),
            hidden_size=16,
            num_blocks=1,
            value_bins=BINS,
            reward_bins=17,
            value_support_max=VMAX,
            reward_support_max=100.0,
        )
        hidden = jnp.ones((3, 16))
        pol, v = net.apply_fns.prediction(net.params.prediction, hidden)
        pol2, v_logits = net.apply_fns.prediction_logits(net.params.prediction, hidden)
        assert v.shape == (3,) and v_logits.shape == (3, BINS)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(dist.expectation(v_logits, VMAX)), rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(pol), np.asarray(pol2))

        q, _ = net.apply_fns.afterstate_prediction(net.params.afterstate_prediction, hidden)
        assert q.shape == (3,)
        chance = jnp.zeros((3, net.codebook_size)).at[:, 0].set(1.0)
        nxt, r = net.apply_fns.dynamics(net.params.dynamics, hidden, chance)
        assert nxt.shape == (3, 16) and r.shape == (3,)

    def test_init_expectation_near_zero(self):
        """Categorical heads must START with expectation ≈ 0 (mass on atom 0),
        like a scalar head — default init puts it at the support midpoint
        (h=160 ≈ raw 20k), which inflated every search backup and pinned
        eval at ~850 (runs/r3_categorical)."""
        net = create_network(
            jax.random.PRNGKey(0), hidden_size=16, num_blocks=1,
            value_bins=BINS, reward_bins=17,
            value_support_max=VMAX, reward_support_max=100.0,
        )
        hidden = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
        _, v = net.apply_fns.prediction(net.params.prediction, hidden)
        q, _ = net.apply_fns.afterstate_prediction(net.params.afterstate_prediction, hidden)
        chance = jnp.zeros((8, net.codebook_size)).at[:, 0].set(1.0)
        _, r = net.apply_fns.dynamics(net.params.dynamics, hidden, chance)
        # atom spacing is VMAX/(BINS-1) = 10; "≈ 0" means well under one atom
        assert float(jnp.abs(v).max()) < 0.1
        assert float(jnp.abs(q).max()) < 0.1
        assert float(jnp.abs(r).max()) < 0.1

    def test_scalar_mode_unchanged(self):
        net = create_network(jax.random.PRNGKey(0), hidden_size=16, num_blocks=1)
        assert net.apply_fns.prediction_logits is None
        assert net.value_bins == 1

    def test_search_runs_on_categorical_net(self):
        from simulate_2048_tpu.env import env as envlib
        from simulate_2048_tpu.search import SearchConfig, run_mcts

        net = create_network(
            jax.random.PRNGKey(0), hidden_size=16, num_blocks=1, value_bins=BINS
        )
        state = envlib.reset_batch(jnp.uint32(3), 2)
        obs = envlib.get_observation(state)
        out = run_mcts(
            net.params,
            net.apply_fns,
            obs[0],
            jax.random.PRNGKey(1),
            SearchConfig(num_simulations=8),
        )
        assert np.isfinite(np.asarray(out.action_weights)).all()
        assert np.isfinite(float(out.search_value))


class TestCategoricalTraining:
    def test_train_step_trains_all_heads(self):
        cfg = _cat_cfg(afterstate_value_loss_weight=0.25)
        state, network = create_train_state(jax.random.PRNGKey(0), cfg)
        # Head kernels are [H, bins] in categorical mode.
        assert state.params.prediction["params"]["value"]["kernel"].shape == (16, BINS)
        assert state.params.dynamics["params"]["reward"]["kernel"].shape == (16, 17)

        buf = add_trajectories(init_buffer(cfg), make_trajectories(4, 8, cfg))
        batch, _, _ = sample_batch(buf, jax.random.PRNGKey(1), 8, cfg)
        optimizer = create_optimizer(cfg)

        def heads(params):
            return [
                np.asarray(x).copy()
                for tree in (
                    params.prediction["params"]["value"],
                    params.dynamics["params"]["reward"],
                    params.afterstate_prediction["params"]["q_value"],
                )
                for x in jax.tree.leaves(tree)
            ]

        before = heads(state.params)
        new_state, loss_output, priorities = train_step(
            state, network.apply_fns, batch, None, cfg, optimizer
        )
        after = heads(new_state.params)
        assert all(not np.array_equal(b, a) for b, a in zip(before, after))
        assert np.isfinite(float(loss_output.total_loss))
        # CE losses start near log(bins), not the scalar head's ~750 MSE.
        assert float(loss_output.value_loss) < 3 * np.log(BINS)
        assert np.isfinite(np.asarray(priorities)).all() and (np.asarray(priorities) > 0).all()

    def test_pallas_backend_accepted(self):
        """Round 5 (VERDICT r4 weak #1): categorical heads run on the Pallas
        kernel — the config-level rejection is gone, and the champion
        config plans RESIDENT. Kernel-vs-XLA equivalence is covered in
        tests/test_pallas_search.py::TestCategoricalHeads."""
        import jax.numpy as jnp

        from simulate_2048_tpu.ops.pallas_search import pallas_search_plan
        from simulate_2048_tpu.training.self_play import search_config_from

        cfg = _cat_cfg(search_backend="pallas")  # must not raise
        assert cfg.value_bins == BINS
        sc = search_config_from(cfg)
        assert (sc.value_bins, sc.reward_bins) == (BINS, 17)
        from dataclasses import replace

        champ = replace(
            cfg,
            hidden_size=128,
            num_residual_blocks=5,
            num_simulations=50,
            search_max_depth=32,
            value_bins=256,
            reward_bins=128,
        )
        assert pallas_search_plan(
            search_config_from(champ), 128, 5, 256, jnp.bfloat16
        ) == 0

    def test_auto_backend_falls_back_to_xla(self):
        """play_segment with 'auto' + categorical must take the XLA path
        (and hence run fine on CPU)."""
        from simulate_2048_tpu.env import env as envlib
        from simulate_2048_tpu.training.self_play import play_segment

        cfg = _cat_cfg(search_backend="auto", num_simulations=4)
        state, network = create_train_state(jax.random.PRNGKey(0), cfg)
        env_state = envlib.reset_batch(jnp.uint32(5), cfg.num_parallel_games)
        _, traj, _ = play_segment(
            state.params,
            network.apply_fns,
            env_state,
            jax.random.PRNGKey(2),
            jnp.float32(1.0),
            cfg,
            cfg.num_parallel_games,
            num_steps=4,
        )
        assert np.isfinite(np.asarray(traj.values)).all()
