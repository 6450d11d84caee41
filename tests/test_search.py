"""Stochastic MCTS: tree mechanics with hand-checkable mock models, search
behavior (bandit preference, chance-prior allocation), and real-network smoke
tests. The reference has no MCTS tests at all (the tree lived in mctx)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.models import NetworkApplyFns, NetworkParams, create_network
from simulate_2048_tpu.search import (
    PolicyOutput,
    SearchConfig,
    batched_run_mcts,
    get_policy_target,
    run_mcts,
    select_action,
    temperature_schedule,
)

A, C, H = 4, 8, 8


def mock_apply_fns(
    q_per_action=(0.0, 0.0, 0.0, 0.0),
    chance_logits=(0.0,) * C,
    reward_per_outcome=0.0,
    leaf_value=0.0,
):
    """Deterministic stand-in models.

    - h: obs → zeros(H)
    - f: hidden → (uniform logits, leaf_value)
    - φ: (s, a) → embeds the action one-hot in the first A dims
    - ψ: afterstate → (q = Σ afterstate[:A]·q_per_action, fixed chance logits)
    - g: (as, c) → (zeros, reward_per_outcome)
    """
    qvec = jnp.asarray(q_per_action, jnp.float32)
    clog = jnp.asarray(chance_logits, jnp.float32)

    return NetworkApplyFns(
        representation=lambda p, o: jnp.zeros(o.shape[:-1] + (H,)),
        prediction=lambda p, h: (
            jnp.zeros(h.shape[:-1] + (A,)),
            jnp.full(h.shape[:-1], leaf_value),
        ),
        afterstate_dynamics=lambda p, s, a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (H - A,))], axis=-1
        ),
        afterstate_prediction=lambda p, s: (
            jnp.sum(s[..., :A] * qvec, axis=-1),
            jnp.broadcast_to(clog, s.shape[:-1] + (C,)),
        ),
        dynamics=lambda p, s, c: (
            jnp.zeros(s.shape[:-1] + (H,)),
            jnp.full(s.shape[:-1], reward_per_outcome),
        ),
        encoder=lambda p, o, deterministic=True: jnp.zeros(o.shape[:-1] + (C,)),
    )


MOCK_PARAMS = NetworkParams(*([{}] * 6))
CFG = SearchConfig(num_simulations=16, num_actions=A, codebook_size=C, dirichlet_fraction=0.0)


class TestTreeMechanics:
    def test_visits_sum_and_shapes(self):
        out = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), CFG)
        assert out.action_weights.shape == (A,)
        assert int(jnp.sum(out.visit_counts)) == CFG.num_simulations
        np.testing.assert_allclose(float(jnp.sum(out.action_weights)), 1.0, rtol=1e-6)

    def test_uniform_model_spreads_visits(self):
        out = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), CFG)
        counts = np.asarray(out.visit_counts)
        assert counts.min() >= 2  # 16 sims over 4 equal actions: near-uniform

    def test_bandit_prefers_high_q_action(self):
        fns = mock_apply_fns(q_per_action=(0.0, 1.0, 0.0, 0.0))
        cfg = CFG._replace(num_simulations=32)
        out = run_mcts(MOCK_PARAMS, fns, jnp.zeros(16), jax.random.PRNGKey(0), cfg)
        assert int(jnp.argmax(out.visit_counts)) == 1
        counts = np.asarray(out.visit_counts)
        assert counts[1] > counts.sum() / 2

    def test_reward_drives_value(self):
        # All leaf values zero; chance-edge rewards = 5 ⇒ every backed-up path
        # through a chance→decision edge contributes ≈5 to the root value.
        fns = mock_apply_fns(reward_per_outcome=5.0)
        cfg = CFG._replace(num_simulations=30, discount=1.0)
        out = run_mcts(MOCK_PARAMS, fns, jnp.zeros(16), jax.random.PRNGKey(0), cfg)
        # Root value mixes depth-1 chance nodes (value 0 backup from ψ=0) and
        # deeper decision nodes (reward 5): it must be positive and ≤ 10.
        assert 0.0 < float(out.search_value) <= 10.0

    def test_chance_selection_follows_prior(self):
        # Peaked chance distribution: outcome 2 has prob ≈ 0.97.
        clog = [0.0] * C
        clog[2] = 5.0
        fns = mock_apply_fns(chance_logits=clog)
        cfg = CFG._replace(num_simulations=40)
        out = run_mcts(MOCK_PARAMS, fns, jnp.zeros(16), jax.random.PRNGKey(0), cfg)
        # Search runs without bias errors; deeper check below via tree internals
        assert int(jnp.sum(out.visit_counts)) == 40

    def test_dirichlet_noise_changes_root_policy(self):
        cfg = CFG._replace(dirichlet_fraction=0.5, dirichlet_alpha=0.3, num_simulations=8)
        out1 = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(1), cfg)
        out2 = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(2), cfg)
        assert not np.array_equal(np.asarray(out1.visit_counts), np.asarray(out2.visit_counts))

    def test_invalid_actions_never_visited(self):
        invalid = jnp.array([False, True, False, True])
        out = run_mcts(
            MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), CFG, invalid
        )
        counts = np.asarray(out.visit_counts)
        assert counts[1] == 0 and counts[3] == 0


class TestBatchedSearch:
    def test_batched_shapes_and_per_element_keys(self):
        fns = mock_apply_fns()
        cfg = CFG._replace(dirichlet_fraction=0.25, num_simulations=8)
        obs = jnp.zeros((3, 16))
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        out = batched_run_mcts(MOCK_PARAMS, fns, obs, keys, cfg)
        assert out.action_weights.shape == (3, A)
        assert out.search_value.shape == (3,)


class TestWithRealNetwork:
    @pytest.fixture(scope="class")
    def net(self):
        return create_network(
            jax.random.PRNGKey(0), hidden_size=16, num_blocks=1, codebook_size=C
        )

    def test_search_runs_and_is_deterministic(self, net):
        cfg = SearchConfig(num_simulations=12, codebook_size=C, dirichlet_fraction=0.0)
        obs = jax.random.uniform(jax.random.PRNGKey(3), (16,))
        out1 = run_mcts(net.params, net.apply_fns, obs, jax.random.PRNGKey(0), cfg)
        out2 = run_mcts(net.params, net.apply_fns, obs, jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(np.asarray(out1.visit_counts), np.asarray(out2.visit_counts))
        assert int(jnp.sum(out1.visit_counts)) == 12

    def test_batched_real_search(self, net):
        cfg = SearchConfig(num_simulations=8, codebook_size=C)
        obs = jax.random.uniform(jax.random.PRNGKey(4), (4, 16))
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        out = batched_run_mcts(net.params, net.apply_fns, obs, keys, cfg)
        assert out.action_weights.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(out.action_weights.sum(-1)), 1.0, rtol=1e-5)

    def test_nonbinding_depth_cap_is_equivalent(self, net):
        # The preset search_max_depth=32 relies on this: as long as no
        # simulation's path reaches the cap, the capped search IS the
        # unbounded search — identical visit decisions; values equal up to
        # matmul reassociation (the backup contracts over a narrower path
        # axis, so float sums associate differently at the ~1e-7 level).
        obs = jax.random.uniform(jax.random.PRNGKey(5), (3, 16))
        keys = jax.random.split(jax.random.PRNGKey(2), 3)
        for cap in (16, 32):
            a = batched_run_mcts(
                net.params, net.apply_fns, obs, keys,
                SearchConfig(num_simulations=32, codebook_size=C, max_depth=None),
            )
            b = batched_run_mcts(
                net.params, net.apply_fns, obs, keys,
                SearchConfig(num_simulations=32, codebook_size=C, max_depth=cap),
            )
            np.testing.assert_array_equal(np.asarray(a.visit_counts), np.asarray(b.visit_counts))
            np.testing.assert_allclose(
                np.asarray(a.search_value), np.asarray(b.search_value), rtol=1e-5, atol=1e-6
            )


class TestPolicyExtraction:
    OUT = PolicyOutput(
        action_weights=jnp.array([0.5, 0.3, 0.2, 0.0]),
        search_value=jnp.float32(1.0),
        visit_counts=jnp.array([5, 3, 2, 0]),
        qvalues=jnp.array([1.0, 0.5, 0.2, 0.0]),
    )

    def test_greedy_target(self):
        target = get_policy_target(self.OUT, jnp.array([True] * 4), temperature=0.0)
        assert np.asarray(target).tolist() == [1.0, 0.0, 0.0, 0.0]

    def test_temperature_one_proportional(self):
        target = get_policy_target(self.OUT, jnp.array([True] * 4), temperature=1.0)
        np.testing.assert_allclose(np.asarray(target)[:3], [0.5, 0.3, 0.2], atol=1e-5)

    def test_legal_mask_zeroes_actions(self):
        target = get_policy_target(self.OUT, jnp.array([False, True, True, True]), 1.0)
        assert float(target[0]) < 1e-6

    def test_select_action_greedy(self):
        a = select_action(self.OUT, jax.random.PRNGKey(0), jnp.array([True] * 4), 0.0)
        assert int(a) == 0

    def test_temperature_schedule(self):
        sched = [(0, 1.0), (100, 0.5), (200, 0.0)]
        assert temperature_schedule(50, sched) == 1.0
        assert temperature_schedule(150, sched) == 0.5
        assert temperature_schedule(250, sched) == 0.0


class TestMaxDepth:
    def test_depth_capped_search_backs_up_existing_children(self):
        cfg = CFG._replace(num_simulations=16, max_depth=1)
        out = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), cfg)
        # Only the root's A=4 chance children can ever be expanded; the other
        # 12 simulations hit the cap and re-back-up — visits still total 16.
        assert int(jnp.sum(out.visit_counts)) == 16
        counts = np.asarray(out.visit_counts)
        assert (counts > 0).sum() == 4

    def test_unbounded_matches_default(self):
        cfg_none = CFG._replace(num_simulations=12, max_depth=None)
        cfg_huge = CFG._replace(num_simulations=12, max_depth=1000)
        a = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), cfg_none)
        b = run_mcts(MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), cfg_huge)
        np.testing.assert_array_equal(np.asarray(a.visit_counts), np.asarray(b.visit_counts))


class TestChanceSelectionModes:
    """Chance-node treatment (VERDICT item 4). The reference gets decision/
    chance interleaving, sampling, and progressive widening for free from
    ``mctx.stochastic_muzero_policy`` (``stochastic_mctx.py:289-301``); mctx
    is NOT installed in this environment (verified), so instead of an oracle
    comparison these tests record the equivalence/divergence analysis:

    - "sample" draws c ~ σ per visit (the paper's scheme) — chance-node visit
      shares converge to σ;
    - "argmax" (p/(1+N) allocation) is its derandomization — identical limit
      allocation, zero variance, and bitwise-deterministic searches;
    - progressive widening bounds distinct chance children by
      ceil(pw_c·(N+1)^pw_alpha) in both modes;
    - pw_c=None + "argmax" is bitwise round-1 behavior.
    """

    def _final_tree(self, cfg, clog, sims, seed=0):
        from simulate_2048_tpu.search import mcts as mcts_lib
        from simulate_2048_tpu.search import tree as tree_lib

        fns = mock_apply_fns(chance_logits=clog)
        key = jax.random.PRNGKey(seed)
        hidden = fns.representation({}, jnp.zeros(16))
        logits, value = fns.prediction({}, hidden)
        tree = tree_lib.init_tree(
            sims + 1, max(A, C), H, hidden, jax.nn.softmax(logits), value
        )
        for s in range(sims):
            k = jax.random.fold_in(key, s) if cfg.chance_selection == "sample" else None
            tree = mcts_lib._expand_and_backup(tree, jnp.int32(s + 1), MOCK_PARAMS, fns, cfg, k)
        return jax.tree.map(np.asarray, tree)

    def _busiest_chance_shares(self, tree):
        """Children-visit distribution at the most-visited chance node (the
        regime where allocation laws are comparable; low-visit nodes are
        dominated by first-visit effects in BOTH schemes)."""
        is_chance = ~tree.is_decision & (tree.node_visit > 0)
        node = np.argmax(np.where(is_chance, tree.node_visit, -1))
        visits = tree.children_visits[node].astype(float)
        return visits / max(visits.sum(), 1), visits.sum()

    def test_sampled_visits_approximate_prior(self):
        clog = [0.0] * C
        clog[1], clog[5] = 2.0, 1.0
        sigma = np.asarray(jax.nn.softmax(jnp.asarray(clog)))
        cfg = CFG._replace(num_simulations=256, chance_selection="sample", max_depth=None)
        shares, n = self._busiest_chance_shares(self._final_tree(cfg, clog, 256))
        # Sampling c ~ σ: empirical shares track σ (few dozen draws ⇒ loose).
        assert n >= 30
        assert abs(shares[1] - sigma[1]) < 0.2
        assert shares[1] == shares.max()

    def test_argmax_is_derandomized_sampling(self):
        clog = [0.0] * C
        clog[1], clog[5] = 2.0, 1.0
        sigma = np.asarray(jax.nn.softmax(jnp.asarray(clog)))
        cfg = CFG._replace(num_simulations=256, chance_selection="argmax", max_depth=None)
        shares, n = self._busiest_chance_shares(self._final_tree(cfg, clog, 256))
        # p/(1+N) allocation approaches σ-proportionality per node as N grows
        # (n_c ≈ σ_c·λ − 1 for a shared λ). DOCUMENTED DIVERGENCE from true
        # sampling: at small N the deterministic rule over-weights the mode —
        # every chance node's FIRST visit goes to argmax σ — so aggregate
        # shares across a tree of mostly-cold nodes skew toward the top code.
        assert n >= 30
        assert abs(shares[1] - sigma[1]) < 0.2
        assert shares[1] == shares.max()
        # Zero-variance: rerunning yields the identical allocation.
        shares2, _ = self._busiest_chance_shares(self._final_tree(cfg, clog, 256))
        np.testing.assert_array_equal(shares, shares2)

    def test_modes_agree_on_peaked_prior(self):
        clog = [0.0] * C
        clog[3] = 10.0  # σ ≈ one-hot
        for mode in ("argmax", "sample"):
            cfg = CFG._replace(num_simulations=32, chance_selection=mode)
            tree = self._final_tree(cfg, clog, 32)
            shares, _ = self._busiest_chance_shares(tree)
            assert shares[3] > 0.99

    def test_progressive_widening_caps_chance_children(self):
        clog = [0.0] * C  # uniform σ: widening must bind hard
        cfg = CFG._replace(
            num_simulations=48, pw_c=1.0, pw_alpha=0.5, max_depth=None
        )
        tree = self._final_tree(cfg, clog, 48)
        checked = 0
        for node in range(tree.node_value.shape[0]):
            if tree.is_decision[node] or tree.node_visit[node] == 0:
                continue
            n_children = int((tree.children_index[node] >= 0).sum())
            bound = int(np.ceil(1.0 * (tree.node_visit[node] + 1) ** 0.5))
            assert n_children <= bound, (node, n_children, bound)
            checked += 1
        assert checked > 0
        # And the widening actually bit: the most-visited chance node has far
        # fewer than C children under a uniform prior.
        chance = ~tree.is_decision & (tree.node_visit > 0)
        busiest = np.argmax(np.where(chance, tree.node_visit, -1))
        assert (tree.children_index[busiest] >= 0).sum() < C

    def test_no_widening_matches_unbounded_cap(self):
        # pw_c large enough to never bind ≡ pw_c=None, bitwise.
        out_none = run_mcts(
            MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0),
            CFG._replace(pw_c=None),
        )
        out_big = run_mcts(
            MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0),
            CFG._replace(pw_c=1e6),
        )
        np.testing.assert_array_equal(
            np.asarray(out_none.visit_counts), np.asarray(out_big.visit_counts)
        )
        np.testing.assert_allclose(
            float(out_none.search_value), float(out_big.search_value), rtol=1e-6
        )

    def test_full_search_runs_in_sample_mode(self):
        net = create_network(jax.random.PRNGKey(0), hidden_size=16, num_blocks=1, codebook_size=C)
        cfg = SearchConfig(
            num_simulations=12, codebook_size=C, chance_selection="sample", pw_c=1.0
        )
        out = run_mcts(net.params, net.apply_fns, jnp.zeros(16), jax.random.PRNGKey(1), cfg)
        assert int(jnp.sum(out.visit_counts)) == 12
        assert np.isfinite(float(out.search_value))


class TestTreeInvariants:
    """Structural invariants of the array tree after a full search, checked
    on the raw tree (catches backup/expansion bookkeeping bugs that the
    policy-output tests can miss — e.g. misaligned edge-Q scatter targets)."""

    def _final_tree(self, sims=24, seed=3):
        from simulate_2048_tpu.search import mcts as mcts_lib
        from simulate_2048_tpu.search import tree as tree_lib

        fns = mock_apply_fns(
            q_per_action=(0.3, -0.1, 0.2, 0.0), reward_per_outcome=0.5, leaf_value=0.25
        )
        cfg = CFG._replace(num_simulations=sims)
        key = jax.random.PRNGKey(seed)
        hidden = fns.representation({}, jnp.zeros(16))
        logits, value = fns.prediction({}, hidden)
        tree = tree_lib.init_tree(
            sims + 1, max(A, C), H, hidden, jax.nn.softmax(logits), value
        )
        for s in range(sims):
            tree = mcts_lib._expand_and_backup(tree, jnp.int32(s + 1), MOCK_PARAMS, fns, cfg)
        return jax.tree.map(np.asarray, tree), cfg

    def test_edge_stats_mirror_child_nodes(self):
        tree, cfg = self._final_tree()
        n = tree.node_value.shape[0]
        for parent in range(n):
            for slot in range(tree.children_index.shape[1]):
                child = tree.children_index[parent, slot]
                if child < 0:
                    continue
                # dense edge visits == child node visits
                assert tree.children_visits[parent, slot] == tree.node_visit[child]
                # dense edge Q == r + gamma * V(child), refreshed by backup
                expected = tree.node_reward[child] + tree.node_discount[
                    child
                ] * tree.node_value[child]
                np.testing.assert_allclose(
                    tree.children_values[parent, slot], expected, rtol=1e-5, atol=1e-6
                )
                # parent pointers are consistent
                assert tree.parent_index[child] == parent
                assert tree.action_from_parent[child] == slot

    def test_visit_conservation(self):
        tree, cfg = self._final_tree()
        # root absorbs every simulation + its initial visit
        assert tree.node_visit[0] == cfg.num_simulations + 1
        # each non-root node's visits = 1 (own expansion backup) + children visits
        for node in range(tree.node_value.shape[0]):
            kids = tree.children_index[node]
            kid_visits = sum(
                tree.node_visit[c] for c in kids[kids >= 0]
            )
            if tree.node_visit[node] > 0:
                assert tree.node_visit[node] == 1 + kid_visits


class TestValueSpaceUntransform:
    """Networks predict in h-space; with ``value_transform_epsilon`` set the
    tree backs up RAW values (``SearchConfig.value_transform_epsilon``)."""

    def _h_space_fns(self, raw: float):
        from simulate_2048_tpu.ops.value_transform import scale_value

        h = float(scale_value(jnp.float32(raw)))
        # f and ψ both report h(raw) everywhere; rewards 0 ⇒ with γ=1 every
        # backed-up value is exactly `raw` when untransformed.
        return mock_apply_fns(q_per_action=(h,) * A, leaf_value=h), h

    def test_untransform_recovers_raw_values(self):
        raw = 40.0
        fns, _ = self._h_space_fns(raw)
        cfg = CFG._replace(value_transform_epsilon=0.001, discount=1.0)
        out = run_mcts(MOCK_PARAMS, fns, jnp.zeros(16), jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(float(out.search_value), raw, rtol=1e-4)
        q = np.asarray(out.qvalues)
        visited = np.asarray(out.visit_counts) > 0
        np.testing.assert_allclose(q[visited], raw, rtol=1e-4)

    def test_default_is_identity_passthrough(self):
        # value_transform_epsilon=None reproduces the reference's behavior:
        # h-space outputs enter the tree verbatim (stochastic_mctx.py:105-212).
        raw = 40.0
        fns, h = self._h_space_fns(raw)
        cfg = CFG._replace(discount=1.0)
        out = run_mcts(MOCK_PARAMS, fns, jnp.zeros(16), jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(float(out.search_value), h, rtol=1e-4)


class TestGumbelRoot:
    """Gumbel-MuZero sequential halving at the root (root_selection="gumbel",
    Danihelka et al. ICLR 2022): visit schedule, improved-policy output,
    legality, and noise semantics. mctx is unavailable here; the schedule is
    pinned against the paper's construction by hand."""

    GCFG = CFG._replace(root_selection="gumbel", num_simulations=16)

    def test_considered_visits_schedule_m4_n16(self):
        from simulate_2048_tpu.search.mcts import considered_visits_table

        table = considered_visits_table(4, 16)
        # m=4, n=16: log2(4)=2 phases. Phase 1: 16/(2*4)=2 sweeps of all 4
        # actions (counts 0 then 1); phase 2: 16/(2*2)=4 sweeps of the top 2
        # (counts 2,3,4,5).
        assert table[4] == (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
        # m<=1 degenerates to revisiting the single candidate every sim.
        assert table[1] == tuple(range(16))
        assert table[0] == tuple(range(16))
        # Every row spends exactly n simulations.
        assert all(len(row) == 16 for row in table)

    def test_all_legal_actions_probed_then_halved(self):
        # The first phase visits every legal action before any halving: with
        # a uniform mock model and 16 sims, all 4 actions get >= 2 visits
        # (two full sweeps) and the total is exactly num_simulations.
        out = run_mcts(
            MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(0), self.GCFG
        )
        counts = np.asarray(out.visit_counts)
        assert counts.sum() == 16
        assert counts.min() >= 2

    def test_halving_concentrates_on_best_action(self):
        fns = mock_apply_fns(q_per_action=(0.0, 1.0, 0.0, 0.0))
        out = run_mcts(
            MOCK_PARAMS,
            fns,
            jnp.zeros(16),
            jax.random.PRNGKey(0),
            self.GCFG._replace(gumbel_scale=0.0),
        )
        counts = np.asarray(out.visit_counts)
        # The final halving bracket (2 survivors, round-robined 4 extra
        # sweeps each) must contain action 1, with the eliminated pair left
        # at their phase-1 counts.
        assert counts[1] == counts.max()
        assert (counts == counts.max()).sum() == 2
        assert counts.min() < counts.max()
        # The WINNER is decided by the improved policy, not visit counts.
        assert int(np.argmax(np.asarray(out.action_weights))) == 1

    def test_improved_policy_is_the_action_weights(self):
        out = run_mcts(
            MOCK_PARAMS, mock_apply_fns(), jnp.zeros(16), jax.random.PRNGKey(3), self.GCFG
        )
        w = np.asarray(out.action_weights)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
        # Uniform logits + equal Q => (near-)uniform improved policy, even
        # though halving left the visit counts concentrated.
        assert w.std() < 0.05

    def test_illegal_actions_excluded_everywhere(self):
        invalid = jnp.array([False, True, False, True])
        out = run_mcts(
            MOCK_PARAMS,
            mock_apply_fns(),
            jnp.zeros(16),
            jax.random.PRNGKey(0),
            self.GCFG,
            invalid,
        )
        counts = np.asarray(out.visit_counts)
        weights = np.asarray(out.action_weights)
        assert counts[1] == 0 and counts[3] == 0
        assert weights[1] == 0.0 and weights[3] == 0.0
        np.testing.assert_allclose(weights.sum(), 1.0, rtol=1e-5)

    def test_gumbel_noise_varies_and_scale_zero_is_deterministic(self):
        run = lambda key, scale: run_mcts(
            MOCK_PARAMS,
            mock_apply_fns(q_per_action=(0.3, 0.0, 0.2, 0.1)),
            jnp.zeros(16),
            key,
            self.GCFG._replace(gumbel_scale=scale),
        )
        noisy = [np.asarray(run(jax.random.PRNGKey(k), 1.0).visit_counts) for k in range(6)]
        assert any(not np.array_equal(noisy[0], v) for v in noisy[1:])
        det = [np.asarray(run(jax.random.PRNGKey(k), 0.0).visit_counts) for k in range(3)]
        assert all(np.array_equal(det[0], v) for v in det[1:])

    def test_eval_mode_forces_puct(self):
        from simulate_2048_tpu.training.config import TrainConfig
        from simulate_2048_tpu.training.self_play import search_config_from

        cfg = TrainConfig(root_selection="gumbel")
        assert search_config_from(cfg, eval_mode=False).root_selection == "gumbel"
        assert search_config_from(cfg, eval_mode=True).root_selection == "puct"

    def test_gumbel_rejects_pallas_backend(self):
        from simulate_2048_tpu.training.config import TrainConfig

        with pytest.raises(ValueError, match="PUCT root selection"):
            TrainConfig(root_selection="gumbel", search_backend="pallas")
