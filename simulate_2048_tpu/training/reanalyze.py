"""Reanalyze: refresh stored replay targets with the current network.

MuZero Reanalyse (Schrittwieser et al. 2020, App. H) re-runs the latest model
over buffered experience so value/policy targets track the improving network
instead of being frozen at collection. The reference has no counterpart —
its targets and priorities are computed once and never touched
(``reinforce/training/self_play.py:124-125``; ``replay_buffer.py:361``
uncalled) — and the round-2 soak analysis (docs/project.md) proved that gap
is this domain's binding constraint: with collection-frozen targets each
generation applies ONE TD(λ) operator step (contraction ≈ 0.998 at γ=0.999,
λ=0.5), pinning the value function at a myopic fixed point; λ=1 escapes it
in-segment but still anchors every truncated boundary on a stale ν_last.

The device-resident buffer (``training/replay.py``) makes the fix cheap and
fully jitted: gather a chunk of episodes, run the current network (and, in
"search" mode, a full batched MCTS) over every stored board, recompute the
TD(λ) targets with fresh bootstraps, scatter values/policies/priorities back.
No host copies; one dispatch per pass.

Two modes (``TrainConfig.reanalyze_mode``):

- ``"value"``: fresh f-values at every position re-bootstrap the TD(λ)
  recursion; the truncated boundary re-grounds on r_last + γ·v̂(closing
  board) — each pass applies a fresh TD(λ) operator step, which is exactly
  the missing contraction. Cost: one forward pass per position (trivial).
- ``"search"``: a full MCTS per stored position additionally rewrites the
  POLICY targets (the paper's Reanalyse; fresh root values replace f-values
  as the bootstraps). Cost: ~T searches per episode — the fused array-tree
  search (13k+ searches/s at 50 sims) keeps a 32-episode chunk ≈ 0.5 s.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from simulate_2048_tpu.models.network import NetworkApplyFns, NetworkParams
from simulate_2048_tpu.ops import board as ops
from simulate_2048_tpu.ops.value_transform import inverse_scale_value, scale_value
from simulate_2048_tpu.search.mcts import _search_single
from simulate_2048_tpu.search.policy import get_policy_target
from simulate_2048_tpu.training import replay as replay_lib
from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.replay import POLICY_DTYPE, PRIORITY_DTYPE, VALUE_DTYPE

Array = jax.Array


def _fresh_values(
    params: NetworkParams, apply_fns: NetworkApplyFns, obs: Array, config: TrainConfig
) -> Array:
    """v̂(obs) from the current net, in the space the target pipeline uses
    (raw returns when ``search_untransform_values``, h-space otherwise —
    matching how search values enter targets at collection)."""
    hidden = apply_fns.representation(params.representation, obs)
    _, v = apply_fns.prediction(params.prediction, hidden)
    if config.search_untransform_values:
        v = inverse_scale_value(v, config.value_epsilon)
    return v


@partial(jax.jit, static_argnums=(2, 4), donate_argnums=(0,))
def reanalyze_slots(
    buffer: replay_lib.BufferState,
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    slots: Array,
    config: TrainConfig,
    key: Array | None = None,
) -> replay_lib.BufferState:
    """Refresh the targets of the episodes at buffer rows ``slots``.

    Rewrites, in place (donated buffer):
    - ``values``: TD(λ) returns re-bootstrapped on the current network
      (``value_target_mode == "td_lambda"``) or the fresh root values
      themselves (``"search"`` target mode — matching what collection would
      have stored);
    - ``policies`` (``reanalyze_mode == "search"`` only): fresh MCTS visit
      distributions at temperature 1.0, as at collection;
    - ``step_priorities``: |h(ν_fresh) − h(z_new)| per position (paper
      App. C), so freshly retargeted windows re-enter the sampling race.

    Rows at or beyond ``buffer.size`` (never written) are left untouched.
    ``key`` seeds the per-position search Dirichlet noise in "search" mode.
    """
    n = slots.shape[0]
    t = buffer.actions.shape[1]

    boards_i8 = buffer.boards[slots]  # (n, T+1, 16) int8 exponents
    obs = boards_i8.astype(jnp.float32) / ops.MAX_EXPONENT  # encode_observation convention
    rewards = buffer.rewards[slots].astype(jnp.float32)  # (n, T)
    lengths = buffer.length[slots]
    terminated = buffer.terminated[slots]
    occupied = slots < buffer.size

    from simulate_2048_tpu.training.self_play import (
        compute_n_step_returns,
        search_config_from,
    )

    if config.reanalyze_mode == "search":
        cfg = search_config_from(config)
        if config.reanalyze_num_simulations is not None:
            cfg = cfg._replace(num_simulations=config.reanalyze_num_simulations)
        if config.reanalyze_prior_temperature is not None:
            cfg = cfg._replace(prior_temperature=config.reanalyze_prior_temperature)
        if config.reanalyze_pb_c_init is not None:
            cfg = cfg._replace(pb_c_init=config.reanalyze_pb_c_init)
        roots = obs[:, :t].reshape(n * t, 16)
        board_exp = boards_i8[:, :t].reshape(n * t, 4, 4).astype(jnp.int32)
        legal = ops.legal_actions_mask(board_exp)  # (n·T, 4)
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, n * t)
        out = jax.vmap(
            lambda o, k, inv: _search_single(params, apply_fns, o, k, cfg, inv)
        )(roots, keys, ~legal)
        # Policy target at temperature 1.0, exactly as at collection
        # (``play_segment``; reference ``self_play.py:124``).
        new_policies = jax.vmap(lambda po, m: get_policy_target(po, m, 1.0))(
            out, legal
        ).reshape(n, t, config.action_size)
        nu = out.search_value.reshape(n, t)
    else:
        new_policies = None
        nu = _fresh_values(
            params, apply_fns, obs[:, :t].reshape(n * t, 16), config
        ).reshape(n, t)

    # Value estimate of the segment's CLOSING board (index `lengths` on the
    # T+1 tape): grounds the truncated boundary one real reward deeper than
    # the collection-time ν_last convention.
    tail_obs = jnp.take_along_axis(
        obs, jnp.minimum(lengths, t)[:, None, None], axis=1
    )[:, 0]
    tail_value = _fresh_values(params, apply_fns, tail_obs, config)

    in_ep = jnp.arange(t)[None, :] < lengths[:, None]
    nu = jnp.where(in_ep, nu, 0.0)

    if config.value_target_mode == "td_lambda":
        new_values = compute_n_step_returns(
            rewards, nu, lengths, config, terminated, tail_value
        )
    else:
        # "search" target mode stores raw root values; the fresh ones replace
        # them directly.
        new_values = nu

    new_prios = jnp.abs(
        scale_value(nu, config.value_epsilon)
        - scale_value(new_values, config.value_epsilon)
    )
    new_prios = jnp.where(in_ep, jnp.maximum(new_prios, 1e-3), 0.0)

    # Leave unoccupied rows untouched (idempotent on an under-filled buffer).
    old_values = buffer.values[slots].astype(jnp.float32)
    old_prios = buffer.step_priorities[slots].astype(jnp.float32)
    keep = occupied[:, None]
    new_values = jnp.where(keep, new_values, old_values)
    new_prios = jnp.where(keep, new_prios, old_prios)

    updates = dict(
        values=buffer.values.at[slots].set(new_values.astype(VALUE_DTYPE)),
        step_priorities=buffer.step_priorities.at[slots].set(
            new_prios.astype(PRIORITY_DTYPE)
        ),
    )
    if new_policies is not None:
        old_policies = buffer.policies[slots].astype(jnp.float32)
        new_policies = jnp.where(in_ep[..., None], new_policies, 0.0)
        new_policies = jnp.where(keep[..., None], new_policies, old_policies)
        updates["policies"] = buffer.policies.at[slots].set(
            new_policies.astype(POLICY_DTYPE)
        )
    return buffer._replace(**updates)


def reanalyze_pass(
    buffer: replay_lib.BufferState,
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    cursor: int,
    config: TrainConfig,
    key: Array | None = None,
) -> tuple[replay_lib.BufferState, int]:
    """One round-robin reanalyze pass: refresh ``reanalyze_episodes`` rows
    starting at ``cursor`` (host int), wrapping over the occupied region.

    Round-robin (rather than priority- or age-ordered) bounds every episode's
    target staleness at ``size / reanalyze_episodes`` passes — the property
    the round-2 analysis identified as load-bearing. Returns the refreshed
    buffer and the advanced cursor.
    """
    size = int(buffer.size)
    if size == 0:
        return buffer, cursor
    n = min(config.reanalyze_episodes, size)
    slots = (cursor + jnp.arange(n, dtype=jnp.int32)) % size
    buffer = reanalyze_slots(buffer, params, apply_fns, slots, config, key)
    return buffer, (cursor + n) % size
