"""Stochastic MuZero losses: K-step unrolled policy/value/reward/chance/
commitment objectives.

Counterpart of ``reinforce/training/losses.py``. One deliberate upgrade over
the reference (flagged in SURVEY.md §2.4 #20): the reference declares the
VQ-VAE chance path but never wires it — its chance target is a constant
one-hot at index 0 and the encoder is unused (``losses.py:296-298``), so the
stochastic model never learns real spawn dynamics. Here
``config.chance_target_mode`` selects:

- ``"oracle"`` (default): 2048's chance event is fully observed, so the
  chance code is GROUND TRUTH — code = 2·cell + is_four, recovered on device
  from consecutive stored boards (obs_{t+1} − afterstate(obs_t, a_t)). ψ's
  chance logits get a CE toward it and g is teacher-forced with it; no
  encoder in the loop, hence no VQ-VAE collapse (docs/project.md).
- ``"oracle_dist"``: like "oracle" but ψ's CE target is the EXACT spawn
  distribution given the afterstate (0.9/n per empty cell for a 2, 0.1/n for
  a 4 — the probabilities of ``ops.board.afterstate_outcomes``), a
  zero-variance target whose CE converges to the true spawn entropy.
- ``"encoder"``: the paper's design — the encoder codes obs_{t+1}
  into a chance one-hot that (a) serves as the (stop-gradient) cross-entropy
  target for ψ's chance prediction, (b) teacher-forces the dynamics input
  via straight-through, and (c) receives a commitment loss.
- ``"placeholder"``: bit-compatible reproduction of the reference behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from simulate_2048_tpu.models.network import NetworkApplyFns, NetworkParams
from simulate_2048_tpu.ops import board as board_ops
from simulate_2048_tpu.ops import distributional
from simulate_2048_tpu.training.config import TrainConfig

Array = jax.Array


class LossOutput(NamedTuple):
    """Loss breakdown (``losses.py:27-36`` + codebook-entropy diagnostic)."""

    total_loss: Array
    policy_loss: Array
    value_loss: Array
    reward_loss: Array
    chance_loss: Array
    commitment_loss: Array
    codebook_entropy: Array
    consistency_loss: Array = jnp.float32(0)
    afterstate_value_loss: Array = jnp.float32(0)


class TrainingTargets(NamedTuple):
    """One training window (``losses.py:38-60``): K+1 observations/policies/
    values, K actions/rewards."""

    observations: Array  # (K+1, obs_dim)
    actions: Array  # (K,)
    target_policies: Array  # (K+1, action_size)
    target_values: Array  # (K+1,)
    target_rewards: Array  # (K,)


# Canonical home is ops.value_transform (the search layer needs h⁻¹ too);
# re-exported here for the established training API.
from simulate_2048_tpu.ops.value_transform import (  # noqa: F401
    inverse_scale_value,
    scale_value,
)


def policy_loss(predicted_logits: Array, target_policy: Array) -> Array:
    """Cross-entropy vs a soft target (``losses.py:112-130``)."""
    return -jnp.sum(target_policy * jax.nn.log_softmax(predicted_logits, axis=-1), axis=-1)


def value_loss(predicted_value: Array, target_value: Array, epsilon: float = 0.001) -> Array:
    """MSE in h-scaled space (``losses.py:134-154``)."""
    return jnp.square(predicted_value - scale_value(target_value, epsilon))


def reward_loss(predicted_reward: Array, target_reward: Array, epsilon: float = 0.001) -> Array:
    """MSE in h-scaled space (``losses.py:158-177``)."""
    return jnp.square(predicted_reward - scale_value(target_reward, epsilon))


def chance_loss(predicted_logits: Array, target_code: Array) -> Array:
    """Cross-entropy vs the chance code (``losses.py:181-198``)."""
    return -jnp.sum(target_code * jax.nn.log_softmax(predicted_logits, axis=-1), axis=-1)


def commitment_loss(encoder_probs: Array, target_code: Array) -> Array:
    """VQ-VAE commitment: ‖e(o) − c‖² (``losses.py:202-220``)."""
    return jnp.sum(jnp.square(encoder_probs - target_code), axis=-1)


def _encode_chance(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    observations: Array,
    noise_scale: float = 0.0,
    key: Array | None = None,
):
    """Encode observations to (straight-through code, hard one-hot, commit).

    One encoder pass in soft mode yields everything: probs for gradients and
    commitment, argmax one-hot for the CE target, straight-through code for
    teacher-forcing the dynamics input. With ``noise_scale > 0`` (and a key),
    Gumbel noise perturbs the code choice during training — an anti-collapse
    measure (see ``config.encoder_noise_scale``).
    """
    probs = apply_fns.encoder(params.encoder, observations, deterministic=False)
    select_logits = jnp.log(probs + 1e-12)
    if noise_scale > 0.0 and key is not None:
        gumbel = jax.random.gumbel(key, probs.shape)
        select_logits = select_logits + noise_scale * gumbel
    one_hot = lax.stop_gradient(
        jax.nn.one_hot(jnp.argmax(select_logits, axis=-1), probs.shape[-1])
    )
    code_st = probs + lax.stop_gradient(one_hot - probs)
    commit = commitment_loss(probs, one_hot)
    return code_st, one_hot, commit


def oracle_chance_targets(
    observations: Array, actions: Array, codebook_size: int, exact_dist: bool = False
) -> tuple[Array, Array, Array]:
    """Ground-truth chance codes from consecutive observations.

    2048's stochastic event is fully observed: given boards b_t, b_{t+1} and
    action a_t, the spawn is ``b_{t+1} − afterstate(b_t, a_t)`` — one cell
    gaining exponent 1 (a 2) or 2 (a 4). The code convention is
    ``2·cell + is_four`` — exactly the 32 slots (cell-major, 2-before-4) of
    :func:`simulate_2048_tpu.ops.board.afterstate_outcomes`, so search-time
    chance children and training targets share one indexing.

    Parameters
    ----------
    observations : (K+1, 16) float obs (exponent / 16 encoding)
    actions : (K,) int

    Returns
    -------
    (code_onehot (K, codebook_size), chance_target (K, codebook_size),
    spawned (K,) bool). ``spawned`` is False where no tile appeared (invalid
    move, or padding past episode end where stored boards repeat) — mask the
    chance CE there. With ``exact_dist``, ``chance_target`` is the exact
    spawn distribution given the afterstate instead of the sampled one-hot.
    """
    k_steps = actions.shape[0]
    boards = jnp.round(observations * board_ops.MAX_EXPONENT).astype(jnp.int32)
    boards = boards.reshape(k_steps + 1, 4, 4)
    after, _ = jax.vmap(board_ops.apply_action)(boards[:-1], actions)
    diff = (boards[1:] - after).reshape(k_steps, 16)
    spawned = jnp.any(diff != 0, axis=-1)
    cell = jnp.argmax(jnp.abs(diff), axis=-1)
    spawn_exp = jnp.take_along_axis(diff, cell[:, None], axis=-1)[:, 0]
    code = 2 * cell + (spawn_exp == 2).astype(jnp.int32)
    code_onehot = jax.nn.one_hot(code, codebook_size)
    if not exact_dist:
        return code_onehot, code_onehot, spawned
    flat_after = after.reshape(k_steps, 16)
    empty = (flat_after == 0).astype(jnp.float32)
    num_empty = jnp.sum(empty, axis=-1, keepdims=True)
    p_cell = empty / jnp.maximum(num_empty, 1.0)
    dist = jnp.stack([0.9 * p_cell, 0.1 * p_cell], axis=-1).reshape(k_steps, 32)
    dist = jnp.pad(dist, ((0, 0), (0, codebook_size - 32)))
    return code_onehot, dist, spawned


def compute_loss(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    batch: TrainingTargets,
    config: TrainConfig,
    weights: Array | None = None,
    key: Array | None = None,
) -> tuple[Array, LossOutput]:
    """Batched K-step unrolled loss (``losses.py:223-389``).

    ``batch`` fields carry a leading batch dim; ``weights`` are optional
    importance-sampling corrections, normalized to mean 1 as in the reference
    (``losses.py:355-362``).
    """
    use_encoder = config.chance_target_mode == "encoder"
    use_oracle = config.chance_target_mode in ("oracle", "oracle_dist")

    # Head-mode dispatch: categorical heads (config.value_bins/reward_bins
    # > 1, see ops.distributional) train on CE toward a two-hot h-space
    # target via the raw-logit apply fns; scalar heads keep the reference's
    # MSE (``losses.py:134-177``). Chosen at trace time — config is static.
    if config.value_bins > 1:
        pred_fn = apply_fns.prediction_logits
        apred_fn = apply_fns.afterstate_prediction_logits

        def v_loss(pred: Array, target_raw: Array) -> Array:
            return distributional.categorical_loss(
                pred,
                scale_value(target_raw, config.value_epsilon),
                config.value_support_max,
            )

    else:
        pred_fn = apply_fns.prediction
        apred_fn = apply_fns.afterstate_prediction

        def v_loss(pred: Array, target_raw: Array) -> Array:
            return value_loss(pred, target_raw, config.value_epsilon)

    if config.reward_bins > 1:
        dyn_fn = apply_fns.dynamics_logits

        def r_loss(pred: Array, target_raw: Array) -> Array:
            return distributional.categorical_loss(
                pred,
                scale_value(target_raw, config.value_epsilon),
                config.reward_support_max,
            )

    else:
        dyn_fn = apply_fns.dynamics

        def r_loss(pred: Array, target_raw: Array) -> Array:
            return reward_loss(pred, target_raw, config.value_epsilon)

    if key is None:
        sample_keys = None
    else:
        sample_keys = jax.random.split(key, batch.actions.shape[0])

    def single_sample_loss(sample: TrainingTargets, sample_key) -> LossOutput:
        k_steps = config.num_unroll_steps

        hidden = apply_fns.representation(params.representation, sample.observations[0])
        logits0, value0 = pred_fn(params.prediction, hidden)
        p0 = policy_loss(logits0, sample.target_policies[0])
        v0 = v_loss(value0, sample.target_values[0])

        if use_encoder:
            # Chance codes of obs_1..obs_K (the observed outcomes of steps 0..K-1).
            code_st, chance_target, commit_all = _encode_chance(
                params,
                apply_fns,
                sample.observations[1:],
                config.encoder_noise_scale,
                sample_key,
            )
            chance_mask = jnp.ones((k_steps,))
        elif use_oracle:
            code_st, chance_target, spawned = oracle_chance_targets(
                sample.observations,
                sample.actions,
                config.codebook_size,
                exact_dist=config.chance_target_mode == "oracle_dist",
            )
            chance_mask = spawned.astype(jnp.float32)
            commit_all = jnp.zeros((k_steps,))
        else:
            width = config.codebook_size
            chance_target = jnp.zeros((k_steps, width)).at[:, 0].set(1.0)
            code_st = chance_target
            chance_mask = jnp.ones((k_steps,))
            commit_all = jnp.zeros((k_steps,))

        # EfficientZero-style self-supervised consistency targets: the
        # re-encoded TRUE next states, stop-gradient (Ye et al. 2021). 2048's
        # round-2 probe measured the unrolled hidden drifting ~130% of the
        # true hidden's norm after ONE step (scripts/model_probe.py) — the
        # drift blurs every value/reward prediction deeper in the tree.
        if config.consistency_loss_weight > 0.0:
            h_true = lax.stop_gradient(
                apply_fns.representation(params.representation, sample.observations[1:])
            )
        else:
            h_true = None

        def unroll_step(carry, step):
            state, acc_p, acc_v, acc_r, acc_c, acc_commit, acc_cons, acc_q = carry
            action_onehot = jax.nn.one_hot(sample.actions[step], config.action_size)

            # MuZero App. G: scale the gradient entering each dynamics step
            # (total gradient through a K-step unroll stays O(1) instead of
            # growing with depth). The reference never applies it.
            s = config.dynamics_gradient_scale
            if s < 1.0:
                state = state * s + lax.stop_gradient(state * (1.0 - s))

            afterstate = apply_fns.afterstate_dynamics(
                params.afterstate_dynamics, state, action_onehot
            )
            q_pred, chance_logits = apred_fn(params.afterstate_prediction, afterstate)

            # Afterstate value loss (paper Eq. 5 trains Q^k toward z_{t+k};
            # the reference never does — SURVEY §2.4 #20 lists no Q term, so
            # its ψ Q-head keeps its random init even though search backs it
            # up into every chance node, ``stochastic_mctx.py:155-165`` /
            # ``search/mcts.py:350,368``). Q(as_t) ≈ E_c[r_t + γV(s_{t+1})]
            # = the same z_t target as the position's value. Config-gated
            # (afterstate_value_loss_weight, 0 = reference behavior).
            step_q = v_loss(q_pred, sample.target_values[step])

            step_c = chance_loss(chance_logits, chance_target[step]) * chance_mask[step]
            if use_encoder or use_oracle:
                chance_input = code_st[step]
            else:
                # Reference behavior: argmax of the model's own prediction
                # (``losses.py:304``).
                chance_input = jax.nn.one_hot(jnp.argmax(chance_logits), config.codebook_size)

            next_state, pred_reward = dyn_fn(params.dynamics, afterstate, chance_input)
            next_logits, next_value = pred_fn(params.prediction, next_state)

            step_p = policy_loss(next_logits, sample.target_policies[step + 1])
            step_v = v_loss(next_value, sample.target_values[step + 1])
            step_r = r_loss(pred_reward, sample.target_rewards[step])

            if h_true is not None:
                # cosine distance to the re-encoded true next state; masked
                # like the chance CE (no real transition past episode end).
                ht = h_true[step]
                cos = jnp.sum(next_state * ht) / (
                    jnp.linalg.norm(next_state) * jnp.linalg.norm(ht) + 1e-8
                )
                step_cons = (1.0 - cos) * chance_mask[step]
            else:
                step_cons = jnp.float32(0)

            return (
                next_state,
                acc_p + step_p,
                acc_v + step_v,
                acc_r + step_r,
                acc_c + step_c,
                acc_commit + commit_all[step],
                acc_cons + step_cons,
                acc_q + step_q,
            ), None

        init = (
            hidden,
            p0,
            v0,
            jnp.float32(0),
            jnp.float32(0),
            jnp.float32(0),
            jnp.float32(0),
            jnp.float32(0),
        )
        (_, tot_p, tot_v, tot_r, tot_c, tot_commit, tot_cons, tot_q), _ = lax.scan(
            unroll_step, init, jnp.arange(k_steps)
        )
        if use_encoder:
            # Mean soft code usage over the window (for the entropy bonus).
            usage = jnp.mean(
                apply_fns.encoder(params.encoder, sample.observations[1:], deterministic=False),
                axis=0,
            )
        else:
            usage = jnp.zeros((config.codebook_size,))
        n_chance = jnp.maximum(jnp.sum(chance_mask), 1.0)
        return (
            LossOutput(
                total_loss=jnp.float32(0),
                policy_loss=tot_p / (k_steps + 1),
                value_loss=tot_v / (k_steps + 1),
                reward_loss=tot_r / k_steps,
                chance_loss=tot_c / n_chance,
                commitment_loss=tot_commit / k_steps,
                codebook_entropy=jnp.float32(0),
                consistency_loss=tot_cons / n_chance,
                afterstate_value_loss=tot_q / k_steps,
            ),
            usage,
        )

    if sample_keys is None:
        batch_losses, usages = jax.vmap(lambda s: single_sample_loss(s, None))(batch)
    else:
        batch_losses, usages = jax.vmap(single_sample_loss)(batch, sample_keys)

    # Batch-level codebook usage entropy: H(mean soft code distribution).
    # Maximizing it fights the majority-code collapse (docs/project.md).
    usage = jnp.mean(usages, axis=0)
    codebook_entropy = -jnp.sum(usage * jnp.log(usage + 1e-12))

    if weights is not None:
        w = weights / jnp.sum(weights) * weights.shape[0]

        def reduce(x: Array) -> Array:
            return jnp.sum(w * x) / w.shape[0]
    else:

        def reduce(x: Array) -> Array:
            return jnp.mean(x)

    mean_p = reduce(batch_losses.policy_loss)
    mean_v = reduce(batch_losses.value_loss)
    mean_r = reduce(batch_losses.reward_loss)
    mean_c = reduce(batch_losses.chance_loss)
    mean_commit = reduce(batch_losses.commitment_loss)
    mean_cons = reduce(batch_losses.consistency_loss)
    mean_q = reduce(batch_losses.afterstate_value_loss)

    total = (
        config.policy_loss_weight * mean_p
        + config.value_loss_weight * mean_v
        + config.reward_loss_weight * mean_r
        + config.chance_loss_weight * mean_c
        + config.commitment_loss_weight * mean_commit
        + config.consistency_loss_weight * mean_cons
        + config.afterstate_value_loss_weight * mean_q
        - config.codebook_entropy_weight * codebook_entropy
    )
    return total, LossOutput(
        total,
        mean_p,
        mean_v,
        mean_r,
        mean_c,
        mean_commit,
        codebook_entropy,
        mean_cons,
        mean_q,
    )
