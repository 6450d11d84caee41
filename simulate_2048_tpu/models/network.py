"""Network bundle: parameters + apply functions for all six networks.

Counterpart of ``reinforce/neural/network.py`` (+ the containers it imports
from ``reinforce/mcts/stochastic_mctx.py:28-53``); here the containers live
with the models, and the search layer depends on models — not the other way
around (the reference's L3→L4 import inversion noted in SURVEY.md §1).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from simulate_2048_tpu.models.muzero import (
    DEFAULT_BLOCKS,
    DEFAULT_CODEBOOK,
    DEFAULT_HIDDEN,
    NUM_ACTIONS,
    AfterstateDynamics,
    AfterstatePrediction,
    Dynamics,
    Encoder,
    Prediction,
    Representation,
)

Array = jax.Array
Params = Any


class NetworkParams(NamedTuple):
    """Parameter trees of the six networks (``stochastic_mctx.py:43-53``)."""

    representation: Params
    prediction: Params
    afterstate_dynamics: Params
    afterstate_prediction: Params
    dynamics: Params
    encoder: Params


class NetworkApplyFns(NamedTuple):
    """Apply functions, each ``(params, *inputs) -> outputs``
    (``stochastic_mctx.py:28-40``).

    The first six always speak the scalar h-space value contract — with
    categorical heads (``value_bins > 1``) they wrap the raw bin logits with
    the support expectation (``ops.distributional.expectation``), so search,
    eval, and priority consumers are head-agnostic. The ``*_logits`` trio is
    non-None only for categorical heads and returns the raw bin logits for
    the cross-entropy loss path (``training.losses``).
    """

    representation: Callable  # (params, obs) -> hidden
    prediction: Callable  # (params, hidden) -> (policy_logits, value)
    afterstate_dynamics: Callable  # (params, hidden, action_onehot) -> afterstate
    afterstate_prediction: Callable  # (params, afterstate) -> (q, chance_logits)
    dynamics: Callable  # (params, afterstate, chance_onehot) -> (hidden, reward)
    encoder: Callable  # (params, obs, deterministic=True) -> chance code
    prediction_logits: Callable | None = None  # (params, hidden) -> (policy, value_bins)
    afterstate_prediction_logits: Callable | None = None  # -> (q_bins, chance_logits)
    dynamics_logits: Callable | None = None  # -> (hidden, reward_bins)


class MuZeroNetwork(NamedTuple):
    """Bundle of params + apply fns + architecture hyperparameters
    (``network.py:34-50``)."""

    params: NetworkParams
    apply_fns: NetworkApplyFns
    observation_dim: int
    action_size: int
    codebook_size: int
    hidden_size: int
    num_blocks: int
    value_bins: int = 1
    reward_bins: int = 1
    value_support_max: float = 0.0
    reward_support_max: float = 0.0


def create_network(
    key: Array,
    observation_dim: int = 16,
    action_size: int = NUM_ACTIONS,
    codebook_size: int = DEFAULT_CODEBOOK,
    hidden_size: int = DEFAULT_HIDDEN,
    num_blocks: int = DEFAULT_BLOCKS,
    compute_dtype: Any = jnp.float32,
    observation_onehot: bool = False,
    value_bins: int = 1,
    reward_bins: int = 1,
    value_support_max: float = 320.0,
    reward_support_max: float = 100.0,
) -> MuZeroNetwork:
    """Initialize all six networks with dummy inputs (``network.py:53-141``).

    ``value_bins``/``reward_bins`` > 1 switch the value, Q and reward heads
    to categorical over an h-space support of ``[0, *_support_max]`` (see
    ``ops.distributional``); the scalar-facing apply fns then return the
    support expectation and the raw logits are exposed via the ``*_logits``
    apply fns.
    """
    k = jax.random.split(key, 6)
    dummy_obs = jnp.zeros((1, observation_dim))
    dummy_hidden = jnp.zeros((1, hidden_size))
    dummy_action = jnp.zeros((1, action_size))
    dummy_chance = jnp.zeros((1, codebook_size))

    rep = Representation(hidden_size, num_blocks, compute_dtype, observation_onehot)
    pred = Prediction(action_size, hidden_size, num_blocks, compute_dtype, value_bins)
    adyn = AfterstateDynamics(hidden_size, action_size, num_blocks, compute_dtype)
    apred = AfterstatePrediction(codebook_size, hidden_size, num_blocks, compute_dtype, value_bins)
    dyn = Dynamics(hidden_size, codebook_size, num_blocks, compute_dtype, reward_bins)
    enc = Encoder(codebook_size, hidden_size, num_blocks, compute_dtype, observation_onehot)

    params = NetworkParams(
        representation=rep.init(k[0], dummy_obs),
        prediction=pred.init(k[1], dummy_hidden),
        afterstate_dynamics=adyn.init(k[2], dummy_hidden, dummy_action),
        afterstate_prediction=apred.init(k[3], dummy_hidden),
        dynamics=dyn.init(k[4], dummy_hidden, dummy_chance),
        encoder=enc.init(k[5], dummy_obs),
    )
    if value_bins == 1 and reward_bins == 1:
        apply_fns = NetworkApplyFns(
            representation=rep.apply,
            prediction=pred.apply,
            afterstate_dynamics=adyn.apply,
            afterstate_prediction=apred.apply,
            dynamics=dyn.apply,
            encoder=enc.apply,
        )
    else:
        from simulate_2048_tpu.ops.distributional import expectation

        if value_bins > 1:

            def prediction_scalar(p, hidden):
                logits, value_logits = pred.apply(p, hidden)
                return logits, expectation(value_logits, value_support_max)

            def afterstate_prediction_scalar(p, afterstate):
                q_logits, chance_logits = apred.apply(p, afterstate)
                return expectation(q_logits, value_support_max), chance_logits

        else:
            prediction_scalar = pred.apply
            afterstate_prediction_scalar = apred.apply

        if reward_bins > 1:

            def dynamics_scalar(p, afterstate, chance):
                hidden, reward_logits = dyn.apply(p, afterstate, chance)
                return hidden, expectation(reward_logits, reward_support_max)

        else:
            dynamics_scalar = dyn.apply

        apply_fns = NetworkApplyFns(
            representation=rep.apply,
            prediction=prediction_scalar,
            afterstate_dynamics=adyn.apply,
            afterstate_prediction=afterstate_prediction_scalar,
            dynamics=dynamics_scalar,
            encoder=enc.apply,
            prediction_logits=pred.apply if value_bins > 1 else None,
            afterstate_prediction_logits=apred.apply if value_bins > 1 else None,
            dynamics_logits=dyn.apply if reward_bins > 1 else None,
        )
    return MuZeroNetwork(
        params=params,
        apply_fns=apply_fns,
        observation_dim=observation_dim,
        action_size=action_size,
        codebook_size=codebook_size,
        hidden_size=hidden_size,
        num_blocks=num_blocks,
        value_bins=value_bins,
        reward_bins=reward_bins,
        value_support_max=value_support_max,
        reward_support_max=reward_support_max,
    )


def count_parameters(params: NetworkParams | Params) -> int:
    """Total scalar parameter count (``network.py:291-312``)."""
    return int(sum(x.size for x in jax.tree.leaves(params)))


def update_params(network: MuZeroNetwork, new_params: NetworkParams) -> MuZeroNetwork:
    """Functional parameter swap (``network.py:314-334``)."""
    return network._replace(params=new_params)
