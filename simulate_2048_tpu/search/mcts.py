"""Batched stochastic MuZero MCTS under jit.

From-scratch replacement for the reference's dependency on
``mctx.stochastic_muzero_policy`` (``reinforce/mcts/stochastic_mctx.py:218-301``
— the repo only supplies network callbacks; the tree lives in mctx). Here the
whole search is in-repo: array tree (``search/tree.py``), PUCT selection at
decision nodes, prior-proportional deterministic selection at chance nodes,
root Dirichlet exploration noise, and value backup along the
decision/chance-interleaved path — one ``lax.fori_loop`` over simulations,
``lax.while_loop``s for traversal/backup, vmapped over the batch so every
network call runs as one batched matmul on the MXU.

Model contract (the five callbacks of ``stochastic_mctx.py:93-215``):
- root:       h(obs) → hidden;  f(hidden) → (action logits, value)
- decision:   φ(hidden, a) → afterstate;  ψ(afterstate) → (Q, chance logits)
- chance:     g(afterstate, c) → (hidden', reward);  f(hidden') → (logits, v)

Per expansion both transitions are evaluated and the right one selected —
the same branchless trade mctx makes; batch elements expand different node
types in lockstep.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simulate_2048_tpu.models.network import NetworkApplyFns, NetworkParams
from simulate_2048_tpu.ops.value_transform import inverse_scale_value
from simulate_2048_tpu.search import tree as tree_lib
from simulate_2048_tpu.search.tree import NEG_INF, ROOT, UNVISITED, Tree

Array = jax.Array


def _untransform_fn(cfg: "SearchConfig"):
    """h⁻¹ on network value/reward outputs, or identity (see SearchConfig)."""
    eps = cfg.value_transform_epsilon
    if eps is None:
        return lambda x: x
    return lambda x: inverse_scale_value(x, eps)


class SearchConfig(NamedTuple):
    """Static search hyperparameters (defaults = paper Appendix C, as in
    ``reinforce/training/config.py:31-37``)."""

    num_simulations: int = 100
    num_actions: int = 4
    codebook_size: int = 32
    discount: float = 0.999
    dirichlet_alpha: float = 0.25
    dirichlet_fraction: float = 0.1
    pb_c_init: float = 1.25
    pb_c_base: float = 19652.0
    # Depth cap (counted in tree edges; decision→chance and chance→decision
    # each count 1). None = unbounded, as the reference passes
    # (``stochastic_mctx.py:227``). When a simulation hits the cap on an
    # already-expanded edge, it backs up that child's current value instead
    # of expanding.
    max_depth: int | None = None
    # Chance-node child selection:
    # - "argmax": deterministic argmax p(c)/(1+N(c)) — allocates visits
    #   proportionally to the predicted chance distribution (the jit-friendly
    #   derandomization; matches round-1 behavior bitwise when pw_c is None).
    # - "sample": c ~ σ, the paper's stochastic scheme (Stochastic MuZero §3:
    #   chance outcomes are SAMPLED from the learned prior during search).
    chance_selection: str = "argmax"
    # Progressive widening on chance nodes (the reference gets this from
    # inside mctx's stochastic policy — SURVEY.md §2.3 #16): a chance node
    # with N visits may have at most ceil(pw_c · (N+1)^pw_alpha) distinct
    # children; until the cap binds, the next child is the highest-prior
    # unexpanded code ("argmax") or any sampled code ("sample"); once it
    # binds, selection is restricted to the already-expanded set. None
    # disables widening (every code is always a candidate).
    pw_c: float | None = None
    pw_alpha: float = 0.5
    # Softmax temperature applied to policy/chance logits wherever priors
    # enter the tree (root and expansions). The round-2 prior sweep
    # (scripts/prior_sweep.py, docs/project.md) measured the trained prior as
    # overconfident relative to its quality: prior_temperature=4 +
    # pb_c_init=0.5 lifted the same checkpoint's eval from 2186±107 to
    # 2938±185 (64 games). 1.0 = paper/reference behavior.
    prior_temperature: float = 1.0
    # Root ACTION selection policy:
    # - "puct": Dirichlet-noised PUCT at the root like everywhere else (the
    #   paper/reference scheme, ``stochastic_mctx.py:289-301``).
    # - "gumbel": Gumbel-MuZero sequential halving (Danihelka et al., ICLR
    #   2022) — root simulations follow a precomputed considered-visits
    #   schedule over the top-m actions ranked by g + logits + σ(q̂), with
    #   Gumbel noise g replacing Dirichlet noise, and the returned
    #   ``action_weights`` are the IMPROVED POLICY softmax(logits + σ(q̂))
    #   instead of the visit distribution. Sampling an action from those
    #   weights at T=1 is exactly the Gumbel-max draw the paper plays, and
    #   using them as the stored policy target is the paper's improved-policy
    #   target. Matches PUCT strength at 2-4× fewer simulations at the root
    #   — the lever that multiplies self-play games per chip-hour.
    #   Interior decision nodes keep PUCT; chance nodes are untouched.
    root_selection: str = "puct"
    # Scale of the root Gumbel noise (0 ⇒ deterministic, for evaluation).
    gumbel_scale: float = 1.0
    # σ(q̂) = (c_visit + max_b N(b)) · c_scale · q̂ with q̂ min-max normalized
    # — the monotone Q transform of Gumbel MuZero §3 (mctx defaults).
    gumbel_c_visit: float = 50.0
    gumbel_c_scale: float = 0.1
    # Networks predict value/reward in h-SCALED space (the training loss
    # regresses toward h(z), ``training/losses.py``), but tree backups compute
    # r + γ·v — only meaningful in RAW (linear) space. When set, every network
    # value/q/reward output is passed through h⁻¹(·, ε) before entering the
    # tree, so backups, PUCT Q-values and the returned ``search_value`` are
    # raw returns. The reference feeds h-space outputs straight into mctx's
    # linear backup (``stochastic_mctx.py:105-212``); keeping that behavior
    # (None, the default here — training sets ε via
    # ``TrainConfig.search_untransform_values``) collapses the learned value
    # horizon to ~td_steps of raw reward (docs/project.md round-2 analysis).
    value_transform_epsilon: float | None = None
    # Head SHAPES of the networks driving this search (used by the Pallas
    # whole-search kernel, which packs raw head weight matrices and must
    # reduce categorical heads to their scalar expectation in-kernel — one
    # (bins, G) softmax·support dot per head, ``ops/pallas_search.py``). The
    # XLA search is oblivious: it consumes the scalar-facing ``apply_fns``
    # where the expectation already happened (``models/network.py:139-157``).
    # 1 = scalar MSE head (reference-faithful); >1 = categorical two-hot over
    # an h-space support [0, *_support_max] (``ops/distributional.py``).
    value_bins: int = 1
    reward_bins: int = 1
    value_support_max: float = 320.0
    reward_support_max: float = 100.0


def considered_visits_table(max_considered: int, num_simulations: int) -> tuple:
    """Sequential-halving visit schedule (Gumbel MuZero, Danihelka et al.
    ICLR 2022, §4 "Planning at the root").

    Row ``m`` is the per-simulation target visit count when ``m`` actions are
    under consideration: the simulation at index ``s`` visits an action whose
    current visit count equals ``row[s]``. The schedule cycles the m
    considered actions round-robin, halving the considered set every
    ``num_simulations / (log2(m) · m_phase)`` sweeps, so the budget splits
    evenly across the log2(m) halving phases. Rows 0/1 degenerate to
    0,1,2,… (a single candidate is revisited every simulation).

    Returns a tuple of ``max_considered + 1`` tuples, each of length
    ``num_simulations`` — static data, computed at trace time.
    """
    import math

    def sequence(m: int) -> tuple:
        if m <= 1:
            return tuple(range(num_simulations))
        log2m = max(1, math.ceil(math.log2(m)))
        visits = [0] * m
        seq: list[int] = []
        considered = m
        while len(seq) < num_simulations:
            extra = max(1, num_simulations // (log2m * considered))
            for _ in range(extra):
                seq.extend(visits[:considered])
                for i in range(considered):
                    visits[i] += 1
            considered = max(2, considered // 2)
        return tuple(seq[:num_simulations])

    return tuple(sequence(m) for m in range(max_considered + 1))


def _gumbel_root_action(
    tree: Tree, cfg: "SearchConfig", gumbel: Array, sim_index: Array, table: Array
) -> Array:
    """Root action for simulation ``sim_index`` under sequential halving.

    Candidates are the actions whose CURRENT root visit count equals the
    scheduled count ``table[num_legal, sim_index]``; among them the winner
    maximizes g + log π + σ(q̂). Because root visits are driven only by this
    rule, the invariant "exactly the top-m considered actions sit at the
    scheduled count" holds and the argmax walks the halving bracket.
    """
    a = cfg.num_actions
    prior = tree.prior_probs[ROOT][:a]
    visits = tree.children_visits[ROOT][:a]
    q = tree.children_values[ROOT][:a]
    parent_value = tree.node_value[ROOT]

    legal = prior > 0
    completed = jnp.where(visits > 0, q, parent_value)
    lo = jnp.minimum(jnp.min(completed), parent_value)
    hi = jnp.maximum(jnp.max(completed), parent_value)
    qn = (completed - lo) / jnp.maximum(hi - lo, 1e-8)
    sigma = (cfg.gumbel_c_visit + jnp.max(visits)) * cfg.gumbel_c_scale * qn
    # log π is equivalent to the raw logits up to a constant (argmax-invariant).
    score = gumbel + jnp.log(jnp.maximum(prior, 1e-30)) + sigma

    num_legal = jnp.sum(legal.astype(jnp.int32))
    target = table[jnp.minimum(num_legal, table.shape[0] - 1), sim_index]
    cand = legal & (visits == target)
    picked = jnp.argmax(jnp.where(cand, score, NEG_INF))
    # Degenerate guard (never hit when the invariant holds — e.g. a root with
    # zero legal actions): best legal score, then slot 0.
    fallback = jnp.argmax(jnp.where(legal, score, NEG_INF))
    return jnp.where(jnp.any(cand), picked, fallback).astype(jnp.int32)


def _gumbel_improved_policy(tree: Tree, cfg: "SearchConfig") -> Array:
    """π′ = softmax(log π + σ(q̂)) over legal root actions — Gumbel MuZero's
    improved policy (the stored training target, and the distribution whose
    T=1 sample reproduces the paper's argmax(g + logits + σ(q)) play via the
    Gumbel-max trick)."""
    a = cfg.num_actions
    prior = tree.prior_probs[ROOT][:a]
    visits = tree.children_visits[ROOT][:a]
    q = tree.children_values[ROOT][:a]
    parent_value = tree.node_value[ROOT]

    legal = prior > 0
    completed = jnp.where(visits > 0, q, parent_value)
    lo = jnp.minimum(jnp.min(completed), parent_value)
    hi = jnp.maximum(jnp.max(completed), parent_value)
    qn = (completed - lo) / jnp.maximum(hi - lo, 1e-8)
    sigma = (cfg.gumbel_c_visit + jnp.max(visits)) * cfg.gumbel_c_scale * qn
    logits = jnp.where(legal, jnp.log(jnp.maximum(prior, 1e-30)) + sigma, NEG_INF)
    return jax.nn.softmax(logits)


class PolicyOutput(NamedTuple):
    """Search result (counterpart of mctx.PolicyOutput as consumed by
    ``reinforce/mcts/policy.py``)."""

    action_weights: Array  # (…, A) visit distribution over root actions
    search_value: Array  # (…,) backed-up root value
    visit_counts: Array  # (…, A) raw root visit counts
    qvalues: Array  # (…, A) root Q values


def _select_child(tree: Tree, node: Array, cfg: SearchConfig, key: Array | None = None) -> Array:
    """Pick the edge to follow from ``node``.

    Decision nodes: PUCT with min-max-normalized Q
    (pb_c = pb_c_init + log((N + pb_c_base + 1)/pb_c_base)).
    Chance nodes: per ``cfg.chance_selection`` — deterministic
    argmax p(c)/(1+N(c)) visit allocation, or the paper's c ~ σ sampling —
    optionally under progressive widening (``cfg.pw_c``; see SearchConfig).

    Reads only dense (K,) rows of the node — no gathers (see tree.py note).
    """
    prior = tree.prior_probs[node]  # padded slots are exactly 0
    child_visits = tree.children_visits[node]
    is_dec = tree.is_decision[node]

    # PUCT score (decision nodes). Inlined min-max Q normalization
    # (tree_lib.qtransform_by_parent_and_siblings) so each stats row is
    # gathered exactly once per traversal step.
    parent_visits = tree.node_visit[node]
    parent_value = tree.node_value[node]
    q = tree.children_values[node]
    completed = jnp.where(child_visits > 0, q, parent_value)
    lo = jnp.minimum(jnp.min(completed), parent_value)
    hi = jnp.maximum(jnp.max(completed), parent_value)
    qt = (completed - lo) / jnp.maximum(hi - lo, 1e-8)
    pb_c = cfg.pb_c_init + jnp.log((parent_visits + cfg.pb_c_base + 1.0) / cfg.pb_c_base)
    puct = qt + pb_c * prior * jnp.sqrt(jnp.maximum(parent_visits, 1)) / (1.0 + child_visits)

    # Chance-node candidate set under progressive widening: expanded children
    # always; a NEW child only while |children| < ceil(pw_c · (N+1)^pw_alpha).
    if cfg.pw_c is not None:
        expanded = tree.children_index[node] != UNVISITED  # (K,)
        n_expanded = jnp.sum(expanded.astype(jnp.int32))
        cap = jnp.ceil(
            cfg.pw_c * jnp.power(parent_visits.astype(jnp.float32) + 1.0, cfg.pw_alpha)
        ).astype(jnp.int32)
        allow_new = n_expanded < jnp.maximum(cap, 1)
    else:
        expanded = None
        allow_new = jnp.bool_(True)

    if cfg.chance_selection == "sample":
        # Paper-faithful: sample c ~ σ (restricted to the expanded set once
        # the widening cap binds).
        if key is None:
            raise ValueError("chance_selection='sample' requires a traversal key")
        if expanded is None:
            allowed = prior > 0
        else:
            allowed = (prior > 0) & (expanded | allow_new)
            # Degenerate guard: nothing allowed (all-zero priors on expanded
            # set) — fall back to any positive-prior slot.
            allowed = jnp.where(jnp.any(allowed), allowed, prior > 0)
        logits = jnp.where(allowed, jnp.log(jnp.maximum(prior, 1e-30)), NEG_INF)
        chance_pick = jax.random.categorical(key, logits).astype(jnp.int32)
        decision_pick = jnp.argmax(jnp.where(prior > 0, puct, NEG_INF)).astype(jnp.int32)
        return jnp.where(is_dec, decision_pick, chance_pick)

    # Deterministic chance score p/(1+N); with widening, unexpanded slots
    # compete only through the single best-prior candidate while allowed.
    chance = prior / (1.0 + child_visits)
    if expanded is not None:
        best_unexpanded = jnp.argmax(jnp.where(~expanded, prior, NEG_INF))
        candidate = expanded | (
            allow_new & (jnp.arange(prior.shape[-1]) == best_unexpanded)
        )
        candidate = candidate | ~jnp.any(candidate)  # degenerate guard
        chance = jnp.where(candidate, chance, NEG_INF)

    score = jnp.where(is_dec, puct, chance)
    # Padded/invalid slots have prior exactly 0: their PUCT score reduces to
    # qt (= normalized parent value). Mask by prior instead of slot index so
    # zero-probability actions are never taken.
    return jnp.argmax(jnp.where(prior > 0, score, NEG_INF)).astype(jnp.int32)


def _traverse(
    tree: Tree, cfg: SearchConfig, key: Array | None = None, root_action: Array | None = None
) -> tuple[Array, Array, Array, Array, Array]:
    """Walk from the root until an unexpanded edge (or the depth cap).

    Records the (node, edge) pairs visited into fixed-size path arrays so the
    backup can replay the path without parent-pointer gathers. Returns
    ``(parent, edge, depth, path_nodes, path_edges)`` where
    ``path_nodes[i], path_edges[i]`` for ``i < depth`` are the traversed
    pairs, ``path_nodes[depth-1] == parent`` and ``path_edges[depth-1] ==
    edge``. ``key`` drives chance-node sampling (``chance_selection="sample"``
    only; unused and optional otherwise). ``root_action``, when given,
    overrides the FIRST pick (Gumbel sequential halving at the root); interior
    nodes always use :func:`_select_child`.
    """
    # A path of depth L needs L expanded ancestors, so depth can never exceed
    # num_simulations + 1 — clamping keeps the recorded-path arrays (and the
    # backup contractions over them) no larger than necessary.
    max_depth = cfg.max_depth if cfg.max_depth is not None else cfg.num_simulations + 1
    max_depth = min(max_depth, cfg.num_simulations + 1)
    sampled = cfg.chance_selection == "sample"
    if sampled and key is None:
        raise ValueError("chance_selection='sample' requires a traversal key")
    if not sampled:
        key = jnp.zeros((2,), jnp.uint32)  # inert loop-carry placeholder

    def pick(node, k):
        if sampled:
            return _select_child(tree, node, cfg, jax.random.fold_in(k, node))
        return _select_child(tree, node, cfg)

    def cond(state):
        _, _, next_node, depth, _, _, _ = state
        return (next_node != UNVISITED) & (depth < max_depth)

    def body(state):
        _, _, node, depth, nodes, edges, k = state
        action = pick(node, k)
        nodes = nodes.at[depth].set(node)
        edges = edges.at[depth].set(action)
        return node, action, tree.children_index[node, action], depth + 1, nodes, edges, k

    action0 = pick(ROOT, key) if root_action is None else root_action
    nodes0 = jnp.zeros((max_depth,), jnp.int32).at[0].set(ROOT)
    edges0 = jnp.zeros((max_depth,), jnp.int32).at[0].set(action0)
    state = (ROOT, action0, tree.children_index[ROOT, action0], jnp.int32(1), nodes0, edges0, key)
    parent, action, _, depth, nodes, edges, _ = jax.lax.while_loop(cond, body, state)
    return parent, action, depth, nodes, edges


def _backup(
    tree: Tree,
    path_nodes: Array,
    path_edges: Array,
    depth: Array,
    leaf: Array,
    leaf_value: Array,
) -> Tree:
    """Propagate ``leaf_value`` along the recorded root→leaf path — vectorized.

    Instead of a sequential while-loop of one-scatter-per-node (one parent
    gather + 4 scatters per path step), the whole backup is a handful of
    vectorized ops: the per-node backed-up values v_i = r_i + γ_i·v_{i+1}
    are computed in closed form via prefix products/sums
    (u_i = Π_i·v_i ⇒ u_i = Σ_{j≥i} Π_j·r_j + Π_depth·leaf_value), then the
    node statistics (running-mean value, visit counts) and the dense edge
    statistics (children_visits / children_values = r + γ·V(child)) are each
    updated with ONE masked scatter. Path nodes are distinct (it's a tree
    path) so the scatters have no collisions; padded slots use out-of-bounds
    indices with ``mode="drop"``.
    """
    p = path_nodes.shape[0]
    ncap = tree.node_value.shape[0]
    k = tree.prior_probs.shape[-1]
    valid = jnp.arange(p) < depth

    # One-hot path masks (iota compares — no indexed memory ops). XLA gathers
    # and scatters are serialized element loops on TPU (measured ~0.5-0.8 ms
    # per (B, P)-indexed op at B=1024); these dense (P, N)/(P, K) masks turn
    # every read and write below into small matmuls that ride the MXU instead.
    u_path = ((path_nodes[:, None] == jnp.arange(ncap)[None, :]) & valid[:, None]).astype(
        jnp.float32
    )  # (P, N)
    w_path = ((path_edges[:, None] == jnp.arange(k)[None, :]) & valid[:, None]).astype(
        jnp.float32
    )  # (P, K)

    # Path node one-hots: path nodes at positions 0..depth-1, the leaf AT
    # position depth (so pair i's child is exactly position i+1), rest masked
    # out via an out-of-range index that matches nothing.
    pos = jnp.arange(p + 1)
    nodes_ext = jnp.concatenate([path_nodes, jnp.zeros((1,), jnp.int32)])
    upd_nodes = jnp.where(pos < depth, nodes_ext, jnp.where(pos == depth, leaf, ncap))
    u_upd = (upd_nodes[:, None] == jnp.arange(ncap)[None, :]).astype(jnp.float32)  # (P+1, N)

    # Edge rewards/discounts along the path: pair i's edge leads INTO the
    # node at position i+1, whose incoming-edge r/γ are stored per node —
    # two (P+1, N)·(N,) matvecs instead of full-table contractions.
    r = (u_upd @ tree.node_reward)[1:]
    d = jnp.where(valid, (u_upd @ tree.node_discount)[1:], 1.0)

    # v_i = r_i + d_i·v_{i+1}, v_depth = leaf_value. With Π_i = Π_{k<i} d_k:
    # u_i = Π_i·v_i = Σ_{j=i}^{depth-1} Π_j·r_j + Π_depth·leaf_value.
    prods = jnp.concatenate([jnp.ones((1,)), jnp.cumprod(d)])  # (p+1,) Π_i
    weighted_r = prods[:p] * r
    csum = jnp.cumsum(weighted_r)
    total = csum[-1]
    prefix_excl = csum - weighted_r  # Σ_{j<i} Π_j·r_j
    u = (total - prefix_excl) + prods[depth] * leaf_value
    v = u / prods[:p]  # value backed into path_nodes[i]

    v_ext = jnp.concatenate([v, jnp.zeros((1,))])
    upd_v = jnp.where(pos < depth, v_ext, jnp.where(pos == depth, leaf_value, 0.0))

    # Per-position old stats (matvec reads) → per-position new running means.
    visit_at = u_upd @ tree.node_visit.astype(jnp.float32)  # (P+1,)
    value_at = u_upd @ tree.node_value
    new_value = (value_at * visit_at + upd_v) / (visit_at + 1.0)

    # Dense writes: each path node/edge is hit at most once (tree path), so a
    # one-hot sum both selects and carries the new value.
    node_hit = u_upd.T @ jnp.ones((p + 1,))  # (N,) 0/1
    node_new = u_upd.T @ new_value
    new_node_value = jnp.where(node_hit > 0, node_new, tree.node_value)
    new_node_visit = tree.node_visit + node_hit.astype(jnp.int32)

    # Edge stats: pair i's child sits at path position i+1 (position depth =
    # leaf), so its fresh value is new_value[i+1]. One fused dot computes the
    # hit mask and the new Q values side by side (concat along K).
    edge_q = r + d * new_value[1:]
    w_cat = jnp.concatenate([w_path, w_path * edge_q[:, None]], axis=1)  # (P, 2K)
    out_cat = jnp.einsum("pn,pm->nm", u_path, w_cat)  # (N, 2K)
    edge_hit = out_cat[:, :k]
    edge_new = out_cat[:, k:]

    return tree._replace(
        node_value=new_node_value,
        node_visit=new_node_visit,
        children_visits=tree.children_visits + edge_hit.astype(jnp.int32),
        children_values=jnp.where(edge_hit > 0, edge_new, tree.children_values),
    )


def _expand_and_backup(
    tree: Tree,
    new_index: Array,
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    cfg: SearchConfig,
    key: Array | None = None,
    root_action: Array | None = None,
) -> Tree:
    """One simulation's expansion: evaluate both transition types at the
    selected frontier edge, install the correct child, back up its value."""
    parent, edge, depth, path_nodes, path_edges = _traverse(tree, cfg, key, root_action)
    existing_child = tree.children_index[parent, edge]
    # False only when the depth cap stopped traversal on an expanded edge.
    needs_expand = existing_child == UNVISITED
    parent_emb = tree.embedding[parent]
    parent_is_dec = tree.is_decision[parent]
    k = tree.prior_probs.shape[-1]
    untf = _untransform_fn(cfg)

    # Decision parent → chance child: φ then ψ (``stochastic_mctx.py:119-165``).
    a_onehot = jax.nn.one_hot(jnp.minimum(edge, cfg.num_actions - 1), cfg.num_actions)
    afterstate = apply_fns.afterstate_dynamics(params.afterstate_dynamics, parent_emb, a_onehot)
    q_value, chance_logits = apply_fns.afterstate_prediction(params.afterstate_prediction, afterstate)
    q_value = untf(q_value)

    # Chance parent → decision child: g then f (``stochastic_mctx.py:167-215``).
    c_onehot = jax.nn.one_hot(jnp.minimum(edge, cfg.codebook_size - 1), cfg.codebook_size)
    hidden, reward = apply_fns.dynamics(params.dynamics, parent_emb, c_onehot)
    action_logits, value = apply_fns.prediction(params.prediction, hidden)
    value, reward = untf(value), untf(reward)

    def pad_probs(logits: Array) -> Array:
        # softmax once at expansion; padded slots stay exactly 0.
        return jnp.zeros((k,)).at[: logits.shape[-1]].set(
            jax.nn.softmax(logits / cfg.prior_temperature)
        )

    embedding_new = jnp.where(parent_is_dec, afterstate, hidden)
    prior_new = jnp.where(parent_is_dec, pad_probs(chance_logits), pad_probs(action_logits))
    model_value = jnp.where(parent_is_dec, q_value, value)
    edge_reward = jnp.where(parent_is_dec, 0.0, reward)
    edge_discount = jnp.where(parent_is_dec, 1.0, cfg.discount)

    tree = tree._replace(
        embedding=tree.embedding.at[new_index].set(embedding_new),
        is_decision=tree.is_decision.at[new_index].set(~parent_is_dec),
        prior_probs=tree.prior_probs.at[new_index].set(prior_new),
        children_index=tree.children_index.at[parent, edge].set(
            jnp.where(needs_expand, new_index, existing_child)
        ),
        # Slot new_index is unreachable when the depth cap skipped expansion
        # (no children_index entry ever points at it), so the unconditional
        # writes below are harmless then — same convention as embedding/prior.
        node_reward=tree.node_reward.at[new_index].set(edge_reward),
        node_discount=tree.node_discount.at[new_index].set(edge_discount),
        parent_index=tree.parent_index.at[new_index].set(
            jnp.where(needs_expand, parent, UNVISITED)
        ),
        action_from_parent=tree.action_from_parent.at[new_index].set(
            jnp.where(needs_expand, edge, UNVISITED)
        ),
    )
    # Depth-capped simulations re-back-up the existing child's current value.
    leaf = jnp.where(needs_expand, new_index, existing_child)
    leaf_value = jnp.where(needs_expand, model_value, tree.node_value[jnp.maximum(existing_child, 0)])
    return _backup(tree, path_nodes, path_edges, depth, leaf, leaf_value)


def _search_single(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    observation: Array,
    key: Array,
    cfg: SearchConfig,
    invalid_actions: Array | None,
) -> PolicyOutput:
    """One full search for one observation (vmap adds the batch dim)."""
    hidden = apply_fns.representation(params.representation, observation)
    root_logits, root_value = apply_fns.prediction(params.prediction, hidden)
    root_value = _untransform_fn(cfg)(root_value)

    gumbel_root = cfg.root_selection == "gumbel"
    # Root exploration noise: π ← (1-ρ)·π + ρ·Dir(α)
    # (mctx's root noise scheme with the reference's ρ=0.1, α=0.25).
    # Gumbel root selection replaces Dirichlet noise with per-action Gumbel
    # draws on the halving scores (the paper's exploration mechanism).
    root_probs = jax.nn.softmax(root_logits / cfg.prior_temperature)
    if cfg.dirichlet_fraction > 0.0 and not gumbel_root:
        noise = jax.random.dirichlet(key, jnp.full((cfg.num_actions,), cfg.dirichlet_alpha))
        root_probs = (1.0 - cfg.dirichlet_fraction) * root_probs + cfg.dirichlet_fraction * noise
    if invalid_actions is not None:
        root_probs = jnp.where(invalid_actions, 0.0, root_probs)
        root_probs = root_probs / jnp.maximum(jnp.sum(root_probs), 1e-12)

    width = max(cfg.num_actions, cfg.codebook_size)
    tree = tree_lib.init_tree(
        num_nodes=cfg.num_simulations + 1,
        width=width,
        hidden_size=hidden.shape[-1],
        root_embedding=hidden,
        root_prior_probs=root_probs,
        root_value=root_value,
    )

    if gumbel_root:
        # One Gumbel draw per search (fixed across simulations — the bracket
        # is a tournament under ONE noise realization, paper §3).
        gumbel = (
            cfg.gumbel_scale
            * jax.random.gumbel(jax.random.fold_in(key, 0x6B1E), (cfg.num_actions,))
            if cfg.gumbel_scale > 0.0
            else jnp.zeros((cfg.num_actions,))
        )
        table = jnp.asarray(
            considered_visits_table(cfg.num_actions, cfg.num_simulations), jnp.int32
        )
    else:
        gumbel = table = None

    sampled_chance = cfg.chance_selection == "sample"
    sim_key = jax.random.fold_in(key, 0x5EED) if sampled_chance else None

    def sim_body(s, tree):
        root_action = (
            _gumbel_root_action(tree, cfg, gumbel, s, table) if gumbel_root else None
        )
        step_key = jax.random.fold_in(sim_key, s) if sampled_chance else None
        return _expand_and_backup(tree, s + 1, params, apply_fns, cfg, step_key, root_action)

    tree = jax.lax.fori_loop(0, cfg.num_simulations, sim_body, tree)

    a = cfg.num_actions
    visit_counts = tree_lib.children_visits(tree, ROOT)[:a]
    qvalues = tree_lib.children_qvalues(tree, ROOT)[:a]
    if gumbel_root:
        # Halving concentrates visits on the bracket winner, so the visit
        # distribution is NOT the policy — the improved policy is.
        action_weights = _gumbel_improved_policy(tree, cfg)
    else:
        total = jnp.sum(visit_counts)
        action_weights = visit_counts.astype(jnp.float32) / jnp.maximum(total, 1)
    return PolicyOutput(
        action_weights=action_weights,
        search_value=tree.node_value[ROOT],
        visit_counts=visit_counts,
        qvalues=qvalues,
    )


@partial(jax.jit, static_argnums=(1, 4, 6))
def run_mcts(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    observation: Array,
    key: Array,
    config: SearchConfig = SearchConfig(),
    invalid_actions: Array | None = None,
    batched: bool = False,
) -> PolicyOutput:
    """Run stochastic MuZero search.

    ``observation``: (obs_dim,) or, with ``batched=True``, (B, obs_dim) with
    ``key`` of shape (B, …) — each batch element gets its own noise key
    (fixing the reference's ``keys[0]``-only quirk, ``stochastic_mctx.py:391``).
    """
    if batched:
        return jax.vmap(
            lambda o, k, inv: _search_single(params, apply_fns, o, k, config, inv)
        )(observation, key, invalid_actions) if invalid_actions is not None else jax.vmap(
            lambda o, k: _search_single(params, apply_fns, o, k, config, None)
        )(observation, key)
    return _search_single(params, apply_fns, observation, key, config, invalid_actions)


def batched_run_mcts(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    observations: Array,
    keys: Array,
    config: SearchConfig = SearchConfig(),
    invalid_actions: Array | None = None,
) -> PolicyOutput:
    """Batch-of-searches convenience wrapper (``stochastic_mctx.py:349-396``)."""
    return run_mcts(params, apply_fns, observations, keys, config, invalid_actions, batched=True)
