"""Learner: optimizer, train state, jitted train step.

Counterpart of ``reinforce/training/learner.py`` (TrainState, warmup
schedule, clipped Adam, value_and_grad train step), with two deltas:
- the train step also emits fresh per-sample priorities (|h(v̂₀) − h(z₀)|,
  the paper's TD-error rule) so the trainer can actually update the buffer —
  the reference computes priorities once and never updates them;
- the whole step is a single pure jitted function of (state, batch), ready
  to be wrapped in a sharded data-parallel step (``parallel/``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from simulate_2048_tpu.models.network import (
    MuZeroNetwork,
    NetworkApplyFns,
    NetworkParams,
    create_network,
)
from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.losses import LossOutput, TrainingTargets, compute_loss, scale_value

Array = jax.Array


class TrainState(NamedTuple):
    """Learner state (``learner.py:29-52``)."""

    params: NetworkParams
    opt_state: Any
    step: Array  # i32


def create_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Linear warmup → constant LR (reference schedule, ``learner.py:54-90``)
    or, with ``config.lr_decay_steps`` set, warmup → cosine decay to
    ``lr_final_fraction``·LR over that horizon; global-norm clip, Adam."""
    if config.lr_decay_steps is not None:
        post_warmup = optax.cosine_decay_schedule(
            config.learning_rate,
            decay_steps=max(config.lr_decay_steps - config.warmup_steps, 1),
            alpha=config.lr_final_fraction,
        )
    else:
        post_warmup = optax.constant_schedule(config.learning_rate)
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, config.learning_rate, config.warmup_steps),
            post_warmup,
        ],
        boundaries=[config.warmup_steps],
    )
    components = [optax.clip_by_global_norm(config.max_grad_norm)]
    if config.weight_decay > 0:
        components.append(optax.adamw(schedule, weight_decay=config.weight_decay))
    else:
        components.append(optax.adam(schedule))
    return optax.chain(*components)


def network_from_config(key: Array, config: TrainConfig) -> MuZeroNetwork:
    """Build the network bundle a ``TrainConfig`` describes.

    The single source of truth for config→architecture plumbing: every
    process that must agree on apply fns / parameter shapes (trainer, eval,
    remote actors) builds through here.
    """
    return create_network(
        key,
        observation_dim=config.observation_dim,
        action_size=config.action_size,
        codebook_size=config.codebook_size,
        hidden_size=config.hidden_size,
        num_blocks=config.num_residual_blocks,
        compute_dtype=jnp.bfloat16 if config.use_bfloat16 else jnp.float32,
        observation_onehot=config.observation_onehot,
        value_bins=config.value_bins,
        reward_bins=config.reward_bins,
        value_support_max=config.value_support_max,
        reward_support_max=config.reward_support_max,
    )


def create_train_state(key: Array, config: TrainConfig) -> tuple[TrainState, MuZeroNetwork]:
    """Initialize networks + optimizer (``learner.py:92-131``)."""
    network = network_from_config(key, config)
    optimizer = create_optimizer(config)
    state = TrainState(
        params=network.params,
        opt_state=optimizer.init(network.params),
        step=jnp.int32(0),
    )
    return state, network


@partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(0,))
def train_step(
    state: TrainState,
    apply_fns: NetworkApplyFns,
    batch: TrainingTargets,
    is_weights: Array | None,
    config: TrainConfig,
    optimizer: optax.GradientTransformation,
) -> tuple[TrainState, LossOutput, Array]:
    """One optimization step (``learner.py:214-303``).

    Returns (new state, loss breakdown, fresh per-sample priorities).
    ``donate_argnums=(0,)`` lets XLA update params/opt-state in place.
    """

    def loss_fn(params: NetworkParams):
        if config.encoder_noise_scale > 0.0:
            rng = jax.random.fold_in(jax.random.PRNGKey(config.seed), state.step)
        else:
            rng = None
        return compute_loss(params, apply_fns, batch, config, is_weights, rng)

    (_, loss_output), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    # Paper-style priorities: |h(v̂₀) − h(z₀)| per sample.
    hidden = apply_fns.representation(new_params.representation, batch.observations[:, 0])
    _, v0 = apply_fns.prediction(new_params.prediction, hidden)
    priorities = jnp.abs(v0 - scale_value(batch.target_values[:, 0], config.value_epsilon))
    priorities = jnp.maximum(priorities, 1e-3)

    new_state = TrainState(params=new_params, opt_state=new_opt_state, step=state.step + 1)
    return new_state, loss_output, priorities


@partial(jax.jit, static_argnums=(3, 4, 5, 6), donate_argnums=(0, 1))
def train_superstep(
    state: TrainState,
    buffer_state,
    key: Array,
    apply_fns: NetworkApplyFns,
    config: TrainConfig,
    optimizer: optax.GradientTransformation,
    num_steps: int,
) -> tuple[TrainState, Any, LossOutput]:
    """``num_steps`` full learner iterations — sample, step, priority update —
    in ONE jitted ``fori_loop``.

    The per-step host loop costs three dispatches plus tracking overhead; on a
    remote-attached TPU that dominates small-model steps. Fusing N steps per
    dispatch removes all host involvement between steps (the device-resident
    replay buffer is what makes this possible — the reference's host NumPy
    buffer could never live inside jit). Returns (state, buffer, mean losses).
    """
    from simulate_2048_tpu.training import replay as replay_lib

    def body(i, carry):
        state, buffer, key, acc = carry
        key, sample_key = jax.random.split(key)
        batch, indices, weights = replay_lib.sample_batch(
            buffer, sample_key, config.batch_size, config
        )
        state, loss_output, priorities = train_step(
            state, apply_fns, batch, weights, config, optimizer
        )
        buffer = replay_lib.update_priorities(buffer, indices, priorities)
        acc = jax.tree.map(lambda a, x: a + x, acc, loss_output)
        return state, buffer, key, acc

    zero = LossOutput(*([jnp.float32(0)] * len(LossOutput._fields)))
    state, buffer_state, _, acc = jax.lax.fori_loop(
        0, num_steps, body, (state, buffer_state, key, zero)
    )
    mean_losses = jax.tree.map(lambda x: x / num_steps, acc)
    return state, buffer_state, mean_losses


def compute_gradient_stats(grads: NetworkParams) -> dict[str, float]:
    """Per-network gradient norms for diagnostics (``learner.py:305-328``)."""
    out = {}
    for name, tree in grads._asdict().items():
        leaves = jax.tree.leaves(tree)
        out[f"grad_norm/{name}"] = float(
            jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        )
    return out
