"""Differential tests: array-tree search vs the independent scalar oracle.

The mctx-golden-trace substitute (SURVEY.md §7 step 4; VERDICT r3 missing
#2): ``tests/oracle_mcts.py`` reimplements the published stochastic-MuZero
search naively (node objects, recursion, on-demand Q) with none of the array
implementation's TPU-shaped machinery. Exact visit-count agreement across
mock models, real networks, depth caps, legality masks and both root-
selection modes pins semantic equivalence of the from-scratch tree — the one
component rebuilt entirely without a reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.models import create_network
from simulate_2048_tpu.search import SearchConfig, run_mcts

from oracle_mcts import oracle_search
from test_search import A, C, MOCK_PARAMS, mock_apply_fns

BASE = SearchConfig(
    num_simulations=24, num_actions=A, codebook_size=C, dirichlet_fraction=0.0
)


def assert_matches_oracle(params, fns, obs, cfg, invalid=None, value_rtol=1e-4):
    out = run_mcts(
        params,
        fns,
        jnp.asarray(obs),
        jax.random.PRNGKey(0),
        cfg,
        None if invalid is None else jnp.asarray(invalid),
    )
    o_visits, o_q, o_value, o_weights = oracle_search(params, fns, obs, cfg, invalid)
    np.testing.assert_array_equal(np.asarray(out.visit_counts), o_visits)
    np.testing.assert_allclose(np.asarray(out.qvalues), o_q, rtol=value_rtol, atol=1e-5)
    np.testing.assert_allclose(float(out.search_value), o_value, rtol=value_rtol)
    # Weights are a softmax of f32 chains computed in different orders (the
    # oracle recomputes Q on demand; the array code keeps dense rows): visit
    # counts are exact, probabilities to float tolerance.
    np.testing.assert_allclose(
        np.asarray(out.action_weights), o_weights, rtol=2e-3, atol=1e-6
    )


class TestMockModels:
    def test_uniform_model(self):
        assert_matches_oracle(MOCK_PARAMS, mock_apply_fns(), np.zeros(16), BASE)

    def test_bandit_q(self):
        fns = mock_apply_fns(q_per_action=(0.1, 0.9, 0.3, 0.5))
        assert_matches_oracle(MOCK_PARAMS, fns, np.zeros(16), BASE._replace(num_simulations=32))

    def test_rewards_and_peaked_chance(self):
        clog = [0.0] * C
        clog[3] = 4.0
        fns = mock_apply_fns(
            q_per_action=(0.0, 0.4, 0.0, 0.0), chance_logits=clog, reward_per_outcome=2.0
        )
        assert_matches_oracle(
            MOCK_PARAMS, fns, np.zeros(16), BASE._replace(num_simulations=40, discount=1.0)
        )

    def test_discounted(self):
        fns = mock_apply_fns(reward_per_outcome=1.5, leaf_value=0.7)
        assert_matches_oracle(
            MOCK_PARAMS, fns, np.zeros(16), BASE._replace(discount=0.997)
        )

    def test_depth_cap_re_backup(self):
        fns = mock_apply_fns(q_per_action=(0.0, 1.0, 0.0, 0.0))
        assert_matches_oracle(
            MOCK_PARAMS, fns, np.zeros(16), BASE._replace(num_simulations=32, max_depth=3)
        )

    def test_invalid_actions(self):
        assert_matches_oracle(
            MOCK_PARAMS,
            mock_apply_fns(q_per_action=(0.2, 0.8, 0.1, 0.6)),
            np.zeros(16),
            BASE,
            invalid=np.array([False, True, False, True]),
        )

    def test_prior_temperature(self):
        fns = mock_apply_fns(q_per_action=(0.1, 0.9, 0.3, 0.5))
        assert_matches_oracle(
            MOCK_PARAMS, fns, np.zeros(16), BASE._replace(prior_temperature=4.0)
        )

    def test_gumbel_sequential_halving(self):
        fns = mock_apply_fns(q_per_action=(0.1, 0.9, 0.3, 0.5))
        assert_matches_oracle(
            MOCK_PARAMS,
            fns,
            np.zeros(16),
            BASE._replace(root_selection="gumbel", gumbel_scale=0.0, num_simulations=16),
        )


class TestRealNetwork:
    @pytest.fixture(scope="class")
    def net(self):
        return create_network(
            jax.random.PRNGKey(3), codebook_size=C, hidden_size=16, num_blocks=1
        )

    def _obs(self):
        board = np.zeros(16, np.float32)
        board[0], board[1], board[5] = 1 / 16, 2 / 16, 3 / 16
        return board

    def test_real_network_matches_oracle(self, net):
        cfg = BASE._replace(num_simulations=20, value_transform_epsilon=0.001)
        assert_matches_oracle(net.params, net.apply_fns, self._obs(), cfg, value_rtol=1e-3)

    def test_real_network_gumbel(self, net):
        cfg = BASE._replace(
            num_simulations=16,
            root_selection="gumbel",
            gumbel_scale=0.0,
            value_transform_epsilon=0.001,
        )
        assert_matches_oracle(net.params, net.apply_fns, self._obs(), cfg, value_rtol=1e-3)

    def test_real_network_masked(self, net):
        cfg = BASE._replace(num_simulations=20, value_transform_epsilon=0.001)
        assert_matches_oracle(
            net.params,
            net.apply_fns,
            self._obs(),
            cfg,
            invalid=np.array([True, False, False, False]),
            value_rtol=1e-3,
        )
