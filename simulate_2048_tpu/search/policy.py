"""Policy extraction and action selection from search results.

Counterpart of ``reinforce/mcts/policy.py``: visit counts → training policy
target, temperature-based action sampling, diagnostics, and the host-side
temperature schedule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from simulate_2048_tpu.search.mcts import PolicyOutput

Array = jax.Array


@partial(jax.jit, static_argnums=(2,))
def get_policy_target(policy_output: PolicyOutput, legal_mask: Array, temperature: float = 1.0) -> Array:
    """Visit counts → normalized policy target (``policy.py:22-64``).

    Masks illegal actions, then log-space temperature softmax; greedy one-hot
    when ``temperature < 0.01``.
    """
    weights = jnp.where(legal_mask, policy_output.action_weights, 0.0)
    if temperature < 0.01:
        return jax.nn.one_hot(jnp.argmax(weights, axis=-1), weights.shape[-1])
    return jax.nn.softmax(jnp.log(weights + 1e-8) / max(temperature, 0.01), axis=-1)


@partial(jax.jit, static_argnums=(3,))
def select_action(
    policy_output: PolicyOutput, key: Array, legal_mask: Array, temperature: float = 1.0
) -> Array:
    """Sample (or argmax at low temperature) an action (``policy.py:67-105``)."""
    policy = get_policy_target(policy_output, legal_mask, temperature)
    if temperature < 0.01:
        return jnp.argmax(policy, axis=-1)
    return jax.random.categorical(key, jnp.log(policy + 1e-30), axis=-1)


def get_search_value(policy_output: PolicyOutput) -> Array:
    """Backed-up root value (``policy.py:109-127``)."""
    return policy_output.search_value


def get_visit_counts(policy_output: PolicyOutput) -> Array:
    """Raw root visit counts (``policy.py:131-147``)."""
    return policy_output.visit_counts


def get_q_values(policy_output: PolicyOutput) -> Array:
    """Root Q values (``policy.py:150-165``)."""
    return policy_output.qvalues


def batched_select_action(
    policy_outputs: PolicyOutput, keys: Array, legal_masks: Array, temperature: float = 1.0
) -> Array:
    """Vectorized :func:`select_action` (``policy.py:168-195``)."""
    return jax.vmap(lambda po, k, m: select_action(po, k, m, temperature))(
        policy_outputs, keys, legal_masks
    )


def batched_get_policy_target(
    policy_outputs: PolicyOutput, legal_masks: Array, temperature: float = 1.0
) -> Array:
    """Vectorized :func:`get_policy_target` (``policy.py:198-220``)."""
    return jax.vmap(lambda po, m: get_policy_target(po, m, temperature))(policy_outputs, legal_masks)


def batched_get_search_value(policy_outputs: PolicyOutput) -> Array:
    """Vectorized :func:`get_search_value` (``policy.py:223-237``)."""
    return policy_outputs.search_value


def temperature_schedule(step: int, schedule) -> float:
    """Piecewise-constant schedule lookup (``policy.py:240-268``)."""
    temperature = schedule[0][1]
    for threshold, temp in schedule:
        if step >= threshold:
            temperature = temp
    return temperature


def sample_from_visits(policy_output: PolicyOutput, key: Array, legal_mask: Array, temperature: float):
    """Jit-friendly variant with traced temperature (used inside on-device
    self-play where the schedule value is data, not static)."""
    weights = jnp.where(legal_mask, policy_output.action_weights, 0.0)
    greedy = jnp.argmax(weights, axis=-1)
    logits = jnp.log(weights + 1e-8) / jnp.maximum(temperature, 0.01)
    sampled = jax.random.categorical(key, logits, axis=-1)
    return lax.select(temperature < 0.01, greedy, sampled)
