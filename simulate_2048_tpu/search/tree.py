"""Fixed-size array tree for stochastic MCTS.

The reference outsources the tree to DeepMind's mctx
(``reinforce/mcts/stochastic_mctx.py:289-301``); this module is the from-
scratch, in-repo equivalent: a struct-of-arrays tree with **interleaved
decision and chance nodes**, fully static shapes, built to live inside one
jitted program and vmap over a batch of independent searches.

Layout (per search; a leading batch dim is added by vmap):

- capacity ``N = num_simulations + 1`` — each simulation expands one node.
- ``K = max(action_size, codebook_size)`` — one child-table width for both
  node types; decision nodes use slots [0, A), chance nodes [0, C), the rest
  are masked by zero priors.
- Edges decision→chance carry (reward 0, discount 1); edges chance→decision
  carry (model reward, γ) — the afterstate formulation of the paper.

Performance note: selection statistics (visits, Q) are stored **densely per
edge** (``children_visits``/``children_values``) and refreshed during backup,
so child selection reads contiguous (K,) rows — no gather chains through
``children_index`` (measured ~2x faster search on TPU than the gather
formulation). Priors are stored as probabilities, computed once at expansion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

UNVISITED = jnp.int32(-1)
ROOT = jnp.int32(0)
NEG_INF = -1e9


class Tree(NamedTuple):
    """Struct-of-arrays search tree (one search; vmap adds the batch dim)."""

    embedding: Array  # (N, H) hidden state (decision) or afterstate (chance)
    is_decision: Array  # (N,) bool
    node_value: Array  # (N,) f32 running mean of backed-up values
    node_visit: Array  # (N,) i32
    prior_probs: Array  # (N, K) f32 probabilities, 0 on padded slots
    children_index: Array  # (N, K) i32, UNVISITED where unexpanded
    children_visits: Array  # (N, K) i32 — dense copy of child visit counts
    children_values: Array  # (N, K) f32 — Q(edge) = r + γ·V(child), refreshed in backup
    # Each node has exactly one parent edge, so that edge's reward/discount
    # are stored per CHILD node as (N,) vectors rather than (N, K) tables —
    # backup reads them with a tiny matvec instead of a full-table
    # contraction, and two 8.5 MB loop-carried buffers disappear.
    node_reward: Array  # (N,) f32 reward on the edge INTO this node
    node_discount: Array  # (N,) f32 discount on the edge INTO this node
    parent_index: Array  # (N,) i32
    action_from_parent: Array  # (N,) i32

    @property
    def capacity(self) -> int:
        return self.node_value.shape[-1]


def init_tree(
    num_nodes: int,
    width: int,
    hidden_size: int,
    root_embedding: Array,
    root_prior_probs: Array,
    root_value: Array,
) -> Tree:
    """Allocate the tree and install the root as node 0 (decision node)."""
    n, k = num_nodes, width
    prior = jnp.zeros((n, k), jnp.float32)
    prior = prior.at[0, : root_prior_probs.shape[-1]].set(root_prior_probs)
    return Tree(
        embedding=jnp.zeros((n, hidden_size), root_embedding.dtype).at[0].set(root_embedding),
        is_decision=jnp.zeros((n,), jnp.bool_).at[0].set(True),
        node_value=jnp.zeros((n,), jnp.float32).at[0].set(root_value),
        node_visit=jnp.zeros((n,), jnp.int32).at[0].set(1),
        prior_probs=prior,
        children_index=jnp.full((n, k), UNVISITED, jnp.int32),
        children_visits=jnp.zeros((n, k), jnp.int32),
        children_values=jnp.zeros((n, k), jnp.float32),
        node_reward=jnp.zeros((n,), jnp.float32),
        node_discount=jnp.ones((n,), jnp.float32),
        parent_index=jnp.full((n,), UNVISITED, jnp.int32),
        action_from_parent=jnp.full((n,), UNVISITED, jnp.int32),
    )


def children_qvalues(tree: Tree, node: Array) -> Array:
    """Dense per-edge Q row (kept fresh by backup)."""
    return tree.children_values[node]


def children_visits(tree: Tree, node: Array) -> Array:
    """Dense per-edge visit counts row (kept fresh by backup)."""
    return tree.children_visits[node]


def qtransform_by_parent_and_siblings(tree: Tree, node: Array) -> Array:
    """Min-max normalized completed Q values (mctx's default for MuZero).

    Unvisited children take the parent's value; normalization bounds come
    from {parent value} ∪ {visited children Q}, so scores are in [0, 1]
    regardless of 2048's unbounded score scale.
    """
    q = tree.children_values[node]
    visits = tree.children_visits[node]
    parent_value = tree.node_value[node]
    completed = jnp.where(visits > 0, q, parent_value)
    lo = jnp.minimum(jnp.min(completed), parent_value)
    hi = jnp.maximum(jnp.max(completed), parent_value)
    return (completed - lo) / jnp.maximum(hi - lo, 1e-8)
