"""Scalar-oracle stochastic MuZero MCTS — an INDEPENDENT reference
implementation for differential-testing ``search/mcts.py``.

SURVEY.md §7 step 4 asks for validation against mctx as the semantics oracle
(the reference's tree lives inside ``mctx.stochastic_muzero_policy``,
``reinforce/mcts/stochastic_mctx.py:289-301``); mctx is not installed in this
image, so this module plays that role: a plain-Python, node-object,
recursion-based tree — no arrays, no vmap, no closed-form backup — built
straight from the published algorithm (PUCT with min-max normalized Q,
deterministic p/(1+N) chance allocation, depth cap with re-backup, raw-space
h⁻¹ untransform, and Gumbel sequential halving at the root). Any place the
array implementation took a TPU-shaped shortcut (dense edge rows, one-hot
contraction backups, prefix-product value chains), this oracle does the naive
thing instead; exact visit-count agreement between the two is therefore
evidence of semantic equivalence, not shared code.

Scope: deterministic configs (``dirichlet_fraction=0``, ``gumbel_scale=0``,
``chance_selection="argmax"``) — randomized paths are covered statistically
by ``tests/test_search.py``.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def _softmax(logits, temperature=1.0):
    x = np.asarray(logits, F32) / F32(temperature)
    x = x - x.max()
    e = np.exp(x, dtype=F32)
    return e / e.sum(dtype=F32)


def _h_inverse(x, eps):
    """h⁻¹ of the MuZero value transform (``ops/value_transform.py``)."""
    if eps is None:
        return x
    x = float(x)
    sign = 1.0 if x >= 0 else -1.0
    a = abs(x)
    inner = (np.sqrt(1.0 + 4.0 * eps * (a + 1.0 + eps)) - 1.0) / (2.0 * eps)
    return float(sign * (inner * inner - 1.0))


class _Node:
    __slots__ = (
        "is_decision",
        "embedding",
        "prior",  # (K,) probabilities, 0 on padded/illegal slots
        "value_sum_count",  # (running mean value, visit count)
        "children",  # dict edge -> _Node
        "edge_reward",  # reward on the edge INTO this node
        "edge_discount",
    )

    def __init__(self, is_decision, embedding, prior, value, edge_reward, edge_discount):
        self.is_decision = is_decision
        self.embedding = embedding
        self.prior = np.asarray(prior, F32)
        self.value_sum_count = [F32(value), 1]
        self.children = {}
        self.edge_reward = F32(edge_reward)
        self.edge_discount = F32(edge_discount)

    @property
    def value(self):
        return self.value_sum_count[0]

    @property
    def visits(self):
        return self.value_sum_count[1]

    def child_visits(self, k):
        c = self.children.get(k)
        return 0 if c is None else c.visits

    def child_q(self, edge):
        """Q(edge) = r + γ·V(child) — recomputed on demand (the array code
        keeps a dense copy refreshed during backup; same quantity)."""
        c = self.children.get(edge)
        if c is None:
            return F32(0.0)
        return F32(c.edge_reward + c.edge_discount * c.value)

    def record_visit(self, value):
        mean, n = self.value_sum_count
        self.value_sum_count = [F32((mean * n + F32(value)) / (n + 1)), n + 1]


def _minmax_q(node):
    """Min-max normalized completed Q over the node's slots (mctx's
    qtransform_by_parent_and_siblings)."""
    k = node.prior.shape[0]
    completed = np.array(
        [node.child_q(i) if node.child_visits(i) > 0 else node.value for i in range(k)],
        F32,
    )
    lo = min(completed.min(), node.value)
    hi = max(completed.max(), node.value)
    return (completed - lo) / max(hi - lo, F32(1e-8))


def _select_puct(node, cfg):
    qt = _minmax_q(node)
    parent_visits = node.visits
    pb_c = cfg.pb_c_init + np.log((parent_visits + cfg.pb_c_base + 1.0) / cfg.pb_c_base)
    k = node.prior.shape[0]
    best, best_score = 0, -np.inf
    for i in range(k):
        if node.prior[i] <= 0:
            continue
        score = qt[i] + pb_c * node.prior[i] * np.sqrt(max(parent_visits, 1)) / (
            1.0 + node.child_visits(i)
        )
        if score > best_score:
            best, best_score = i, score
    return best


def _select_chance(node):
    best, best_score = 0, -np.inf
    for i in range(node.prior.shape[0]):
        if node.prior[i] <= 0:
            continue
        score = node.prior[i] / (1.0 + node.child_visits(i))
        if score > best_score:
            best, best_score = i, score
    return best


def _select_gumbel_root(root, cfg, sim_index, table, num_actions):
    """Sequential-halving root pick (gumbel_scale=0: no noise)."""
    prior = root.prior[:num_actions]
    legal = prior > 0
    visits = np.array([root.child_visits(i) for i in range(num_actions)])
    qt = _minmax_q(root)[:num_actions]
    sigma = (cfg.gumbel_c_visit + visits.max()) * cfg.gumbel_c_scale * qt
    score = np.where(legal, np.log(np.maximum(prior, 1e-30)) + sigma, -np.inf)
    target = table[min(int(legal.sum()), len(table) - 1)][sim_index]
    cand = legal & (visits == target)
    if cand.any():
        masked = np.where(cand, score, -np.inf)
        return int(np.argmax(masked))
    return int(np.argmax(score))


def oracle_search(params, apply_fns, observation, cfg, invalid_actions=None):
    """Run one full search; returns (visit_counts, qvalues, root_value,
    action_weights) over the first ``cfg.num_actions`` slots.

    ``apply_fns``/``params`` are the same callbacks the array search uses
    (evaluated batch-less); every scalar network output goes through the same
    h⁻¹ when ``cfg.value_transform_epsilon`` is set.
    """
    import jax.numpy as jnp

    assert cfg.dirichlet_fraction == 0.0, "oracle covers deterministic configs"
    assert cfg.chance_selection == "argmax"
    eps = cfg.value_transform_epsilon
    a_size, c_size = cfg.num_actions, cfg.codebook_size
    k = max(a_size, c_size)

    def pad(probs):
        out = np.zeros((k,), F32)
        out[: probs.shape[-1]] = np.asarray(probs, F32)
        return out

    hidden = apply_fns.representation(params.representation, jnp.asarray(observation))
    logits, value = apply_fns.prediction(params.prediction, hidden)
    root_probs = pad(_softmax(np.asarray(logits), cfg.prior_temperature))
    if invalid_actions is not None:
        root_probs[: a_size][np.asarray(invalid_actions)] = 0.0
        root_probs /= max(root_probs.sum(), 1e-12)
    root = _Node(True, hidden, root_probs, _h_inverse(float(value), eps), 0.0, 1.0)

    max_depth = cfg.max_depth if cfg.max_depth is not None else cfg.num_simulations + 1
    max_depth = min(max_depth, cfg.num_simulations + 1)

    gumbel_root = cfg.root_selection == "gumbel"
    if gumbel_root:
        assert cfg.gumbel_scale == 0.0, "oracle covers deterministic configs"
        from simulate_2048_tpu.search.mcts import considered_visits_table

        table = considered_visits_table(a_size, cfg.num_simulations)

    for sim in range(cfg.num_simulations):
        # -- traverse ---------------------------------------------------
        path = []  # (node, edge) pairs
        node = root
        depth = 0
        while True:
            if not path:
                if gumbel_root:
                    edge = _select_gumbel_root(root, cfg, sim, table, a_size)
                else:
                    edge = _select_puct(node, cfg)
            else:
                edge = _select_puct(node, cfg) if node.is_decision else _select_chance(node)
            path.append((node, edge))
            depth += 1
            child = node.children.get(edge)
            if child is None or depth >= max_depth:
                break
            node = child

        parent, edge = path[-1]
        existing = parent.children.get(edge)

        # -- expand -----------------------------------------------------
        if existing is None:
            if parent.is_decision:
                a = jnp.zeros((a_size,)).at[min(edge, a_size - 1)].set(1.0)
                afterstate = apply_fns.afterstate_dynamics(
                    params.afterstate_dynamics, parent.embedding, a
                )
                q, chance_logits = apply_fns.afterstate_prediction(
                    params.afterstate_prediction, afterstate
                )
                leaf = _Node(
                    False,
                    afterstate,
                    pad(_softmax(np.asarray(chance_logits), cfg.prior_temperature)),
                    _h_inverse(float(q), eps),
                    0.0,
                    1.0,
                )
            else:
                c = jnp.zeros((c_size,)).at[min(edge, c_size - 1)].set(1.0)
                hidden2, reward = apply_fns.dynamics(params.dynamics, parent.embedding, c)
                logits2, value2 = apply_fns.prediction(params.prediction, hidden2)
                leaf = _Node(
                    True,
                    hidden2,
                    pad(_softmax(np.asarray(logits2), cfg.prior_temperature)),
                    _h_inverse(float(value2), eps),
                    _h_inverse(float(reward), eps),
                    cfg.discount,
                )
            parent.children[edge] = leaf
            leaf_value = leaf.value
            # The leaf's init visit already counts this simulation (the array
            # code's position-``depth`` update lands on a fresh node with
            # visit 0 → value = leaf_value, visit 1 — same state).
        else:
            # Depth cap hit on an expanded edge: re-back-up its current value.
            leaf = existing
            leaf_value = existing.value
            leaf.record_visit(leaf_value)

        # -- backup (naive recursion, leaf → root) ----------------------
        chain = [leaf] + [n for n, _ in reversed(path)]
        v = F32(leaf_value)
        for nxt, node_ in zip(chain[:-1], chain[1:]):
            v = F32(nxt.edge_reward + nxt.edge_discount * v)
            node_.record_visit(v)

    visit_counts = np.array([root.child_visits(i) for i in range(a_size)], np.int32)
    qvalues = np.array([root.child_q(i) for i in range(a_size)], F32)
    if gumbel_root:
        prior = root.prior[:a_size]
        legal = prior > 0
        qt = _minmax_q(root)[:a_size]
        sigma = (
            (cfg.gumbel_c_visit + visit_counts.max()) * cfg.gumbel_c_scale * qt
        )
        logits = np.where(legal, np.log(np.maximum(prior, 1e-30)) + sigma, -1e9)
        weights = _softmax(logits)
    else:
        weights = visit_counts / max(visit_counts.sum(), 1)
    return visit_counts, qvalues, F32(root.value), np.asarray(weights, F32)
