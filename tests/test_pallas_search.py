"""Whole-search Pallas kernel vs the XLA search: differential test.

Runs the kernel in interpreter mode (CPU) and the reference
``batched_run_mcts`` on identical inputs/keys. Both paths apply the same
Dirichlet noise outside the simulation loop (same function, same keys), and
argmax-mode search has no in-loop randomness, so root visit counts must
agree EXACTLY; values agree to float tolerance (reduction-order only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.models.network import create_network
from simulate_2048_tpu.ops.pallas_search import BLOCK_G, run_mcts_pallas
from simulate_2048_tpu.search.mcts import SearchConfig, batched_run_mcts

HIDDEN = 32
BLOCKS = 2


@pytest.fixture(scope="module")
def net():
    return create_network(
        jax.random.PRNGKey(0), hidden_size=HIDDEN, num_blocks=BLOCKS
    )


def make_inputs(b, seed=1):
    key = jax.random.PRNGKey(seed)
    k_obs, k_search = jax.random.split(key)
    # plausible observations: exponents 0..10 / 16
    boards = jax.random.randint(k_obs, (b, 16), 0, 11)
    obs = boards.astype(jnp.float32) / 16.0
    keys = jax.random.split(k_search, b)
    return obs, keys


CFG = SearchConfig(
    num_simulations=12,
    max_depth=8,
    value_transform_epsilon=0.001,
)


class TestPallasSearchEquivalence:
    def test_matches_xla_search(self, net):
        obs, keys = make_inputs(BLOCK_G)
        ref = batched_run_mcts(net.params, net.apply_fns, obs, keys, CFG)
        out = run_mcts_pallas(
            net.params, net.apply_fns, obs, keys, CFG,
            num_blocks=BLOCKS, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out.visit_counts), np.asarray(ref.visit_counts)
        )
        np.testing.assert_allclose(
            np.asarray(out.search_value), np.asarray(ref.search_value), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.qvalues), np.asarray(ref.qvalues), rtol=1e-3, atol=1e-4
        )

    def test_matches_with_legality_mask(self, net):
        obs, keys = make_inputs(BLOCK_G, seed=7)
        invalid = jax.random.bernoulli(jax.random.PRNGKey(9), 0.3, (BLOCK_G, 4))
        invalid = jnp.where(
            jnp.all(invalid, axis=-1, keepdims=True),  # keep ≥1 legal action
            jnp.zeros_like(invalid),
            invalid,
        )
        ref = batched_run_mcts(net.params, net.apply_fns, obs, keys, CFG, invalid)
        out = run_mcts_pallas(
            net.params, net.apply_fns, obs, keys, CFG, invalid,
            num_blocks=BLOCKS, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out.visit_counts), np.asarray(ref.visit_counts)
        )
        # masked actions are never visited
        assert (np.asarray(out.visit_counts)[np.asarray(invalid)] == 0).all()

    def test_multi_block_grid(self, net):
        obs, keys = make_inputs(2 * BLOCK_G, seed=3)
        ref = batched_run_mcts(net.params, net.apply_fns, obs, keys, CFG)
        out = run_mcts_pallas(
            net.params, net.apply_fns, obs, keys, CFG,
            num_blocks=BLOCKS, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out.visit_counts), np.asarray(ref.visit_counts)
        )

    def test_prior_temperature_parity(self, net):
        cfg = CFG._replace(prior_temperature=4.0, pb_c_init=0.5)
        obs, keys = make_inputs(BLOCK_G, seed=13)
        ref = batched_run_mcts(net.params, net.apply_fns, obs, keys, cfg)
        out = run_mcts_pallas(
            net.params, net.apply_fns, obs, keys, cfg,
            num_blocks=BLOCKS, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out.visit_counts), np.asarray(ref.visit_counts)
        )

    def test_depth_cap_and_deep_trees(self, net):
        cfg = CFG._replace(num_simulations=20, max_depth=4)
        obs, keys = make_inputs(BLOCK_G, seed=5)
        ref = batched_run_mcts(net.params, net.apply_fns, obs, keys, cfg)
        out = run_mcts_pallas(
            net.params, net.apply_fns, obs, keys, cfg,
            num_blocks=BLOCKS, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out.visit_counts), np.asarray(ref.visit_counts)
        )
        np.testing.assert_allclose(
            np.asarray(out.search_value), np.asarray(ref.search_value), rtol=1e-3, atol=1e-4
        )
