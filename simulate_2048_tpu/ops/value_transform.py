"""MuZero value scaling h / h⁻¹ (``reinforce/training/losses.py:63-108``).

h(x) = sign(x)(√(|x|+1) − 1) + εx compresses 2048's unbounded returns into a
regression-friendly range; networks predict in h-space. These live in ``ops``
(not ``training``) because the SEARCH needs h⁻¹ too: tree backups compute
r + γ·v, which is only meaningful in RAW (linear) space, so network value /
reward outputs must be un-transformed before entering the tree (see
``search.mcts.SearchConfig.value_transform_epsilon``). The reference feeds
h-space outputs straight into mctx's linear backup
(``reinforce/mcts/stochastic_mctx.py:105-212``) — a flaw, not a feature:
mixing h-space bootstrap values with raw rewards in TD targets collapses the
value function's horizon to roughly ``td_steps`` of raw reward
(docs/project.md, round-2 soak analysis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def scale_value(value: Array, epsilon: float = 0.001) -> Array:
    """h(x) = sign(x)(√(|x|+1) − 1) + εx (``losses.py:63-84``)."""
    return jnp.sign(value) * (jnp.sqrt(jnp.abs(value) + 1) - 1) + epsilon * value


def inverse_scale_value(scaled: Array, epsilon: float = 0.001) -> Array:
    """h⁻¹ (``losses.py:87-108``)."""
    inside = 1 + 4 * epsilon * (jnp.abs(scaled) + 1 + epsilon)
    return jnp.sign(scaled) * (jnp.square((jnp.sqrt(inside) - 1) / (2 * epsilon)) - 1)
