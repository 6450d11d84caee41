"""The six Stochastic MuZero networks.

Same factorization as the paper and the reference
(``reinforce/neural/models.py``):

- ``Representation``       h:  observation → hidden state
- ``Prediction``           f:  hidden → (policy logits, value)
- ``AfterstateDynamics``   φ:  (hidden, action one-hot) → afterstate
- ``AfterstatePrediction`` ψ:  afterstate → (Q value, chance logits)
- ``Dynamics``             g:  (afterstate, chance one-hot) → (hidden, reward)
- ``Encoder``              e:  observation → one-hot chance code (VQ-VAE style
                               straight-through)

All trunks share :class:`~simulate_2048_tpu.models.blocks.TowerWithHead`;
heads emit float32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simulate_2048_tpu.models.blocks import TowerWithHead

Array = jax.Array
Dtype = Any

DEFAULT_HIDDEN = 256
DEFAULT_BLOCKS = 10
DEFAULT_CODEBOOK = 32
NUM_ACTIONS = 4
ONEHOT_DEPTH = 16  # exponents 0..15 cover tiles up to 32768


def _categorical_head(num_bins: int, name: str):
    """Final Dense for a categorical value/reward head, initialized so the
    initial EXPECTATION is ≈ 0 (all softmax mass on atom 0), matching a
    scalar head's ~0 init. With default init the expectation starts at the
    support MIDPOINT (h-space 160 ≈ raw 20k for the default value support):
    measured on-TPU, search backups then start ~8x the true returns and the
    ν_last bootstrap anchors targets there — eval pinned at ~850
    (``runs/r3_categorical``, docs/project.md round 3)."""
    return nn.Dense(
        num_bins,
        dtype=jnp.float32,
        name=name,
        kernel_init=nn.initializers.zeros,
        bias_init=lambda key, shape, dtype=jnp.float32: jnp.full(
            shape, -14.0, dtype
        ).at[..., 0].set(0.0),
    )


def expand_observation(observation: Array, onehot: bool) -> Array:
    """Optionally lift the scalar exponent observation to per-cell one-hots.

    The reference's JAX training path feeds log2(tile)/16 scalars
    (``core.py:347``) — a representation that forces the MLP to carve 16
    thresholds per cell before it can reason about tiles. ``onehot=True``
    (``TrainConfig.observation_onehot``) re-encodes each cell as a 16-way
    one-hot (16 cells × 16 = 256 inputs), the standard encoding of strong
    2048 networks (cf. the reference's own NumPy-side option,
    ``twentyfortyeight.py:66-68``). Model-side only: envs, replay and search
    still exchange the compact scalar form.
    """
    if not onehot:
        return observation
    exps = jnp.round(observation * 16.0).astype(jnp.int32)
    oh = jax.nn.one_hot(exps, ONEHOT_DEPTH, dtype=observation.dtype)
    return oh.reshape(observation.shape[:-1] + (observation.shape[-1] * ONEHOT_DEPTH,))


class Representation(nn.Module):
    """h: observation → hidden state (``models.py:105-149``)."""

    hidden_size: int = DEFAULT_HIDDEN
    num_blocks: int = DEFAULT_BLOCKS
    compute_dtype: Dtype = jnp.float32
    onehot_input: bool = False

    @nn.compact
    def __call__(self, observation: Array) -> Array:
        observation = expand_observation(observation, self.onehot_input)
        x = TowerWithHead(self.hidden_size, self.num_blocks, self.compute_dtype)(observation)
        return nn.Dense(self.hidden_size, dtype=jnp.float32, name="hidden_state")(x)


class Prediction(nn.Module):
    """f: hidden → (policy logits, value) (``models.py:152-205``).

    With ``value_bins == 1`` (reference-faithful) the value output is an
    h-space scalar. With ``value_bins > 1`` it is categorical-head logits of
    shape ``[..., value_bins]`` over :mod:`~simulate_2048_tpu.ops.distributional`'s
    support; ``models.network`` wraps the scalar-facing API with the
    expectation so search/eval consumers are unchanged.
    """

    action_size: int = NUM_ACTIONS
    hidden_size: int = DEFAULT_HIDDEN
    num_blocks: int = DEFAULT_BLOCKS
    compute_dtype: Dtype = jnp.float32
    value_bins: int = 1

    @nn.compact
    def __call__(self, state: Array) -> tuple[Array, Array]:
        x = TowerWithHead(self.hidden_size, self.num_blocks, self.compute_dtype)(state)
        policy_logits = nn.Dense(self.action_size, dtype=jnp.float32, name="policy_logits")(x)
        if self.value_bins == 1:
            value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
            return policy_logits, jnp.squeeze(value, axis=-1)
        return policy_logits, _categorical_head(self.value_bins, "value")(x)


class AfterstateDynamics(nn.Module):
    """φ: (hidden, action one-hot) → afterstate (``models.py:208-260``).

    Inputs fuse by projected addition, as in the reference (``:248-250``).
    """

    hidden_size: int = DEFAULT_HIDDEN
    action_size: int = NUM_ACTIONS
    num_blocks: int = DEFAULT_BLOCKS
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, state: Array, action: Array) -> Array:
        fused = nn.Dense(self.hidden_size, dtype=self.compute_dtype)(state) + nn.Dense(
            self.hidden_size, dtype=self.compute_dtype
        )(action)
        x = TowerWithHead(self.hidden_size, self.num_blocks, self.compute_dtype)(fused)
        return nn.Dense(self.hidden_size, dtype=jnp.float32, name="afterstate")(x)


class AfterstatePrediction(nn.Module):
    """ψ: afterstate → (Q value, chance logits) (``models.py:263-317``).

    ``value_bins`` behaves as in :class:`Prediction` (scalar when 1,
    categorical logits otherwise).
    """

    codebook_size: int = DEFAULT_CODEBOOK
    hidden_size: int = DEFAULT_HIDDEN
    num_blocks: int = DEFAULT_BLOCKS
    compute_dtype: Dtype = jnp.float32
    value_bins: int = 1

    @nn.compact
    def __call__(self, afterstate: Array) -> tuple[Array, Array]:
        x = TowerWithHead(self.hidden_size, self.num_blocks, self.compute_dtype)(afterstate)
        chance_logits = nn.Dense(self.codebook_size, dtype=jnp.float32, name="chance_logits")(x)
        if self.value_bins == 1:
            q_value = nn.Dense(1, dtype=jnp.float32, name="q_value")(x)
            return jnp.squeeze(q_value, axis=-1), chance_logits
        return _categorical_head(self.value_bins, "q_value")(x), chance_logits


class Dynamics(nn.Module):
    """g: (afterstate, chance one-hot) → (next hidden, reward) (``models.py:320-378``)."""

    hidden_size: int = DEFAULT_HIDDEN
    codebook_size: int = DEFAULT_CODEBOOK
    num_blocks: int = DEFAULT_BLOCKS
    compute_dtype: Dtype = jnp.float32
    reward_bins: int = 1

    @nn.compact
    def __call__(self, afterstate: Array, chance_code: Array) -> tuple[Array, Array]:
        fused = nn.Dense(self.hidden_size, dtype=self.compute_dtype)(afterstate) + nn.Dense(
            self.hidden_size, dtype=self.compute_dtype
        )(chance_code)
        x = TowerWithHead(self.hidden_size, self.num_blocks, self.compute_dtype)(fused)
        next_state = nn.Dense(self.hidden_size, dtype=jnp.float32, name="next_state")(x)
        if self.reward_bins == 1:
            reward = nn.Dense(1, dtype=jnp.float32, name="reward")(x)
            return next_state, jnp.squeeze(reward, axis=-1)
        return next_state, _categorical_head(self.reward_bins, "reward")(x)


class Encoder(nn.Module):
    """e: observation → one-hot chance code (``models.py:381-443``).

    Deterministic mode: straight-through argmax (forward = one-hot, gradient
    = identity on logits). Non-deterministic: softmax relaxation.
    """

    codebook_size: int = DEFAULT_CODEBOOK
    hidden_size: int = DEFAULT_HIDDEN
    num_blocks: int = DEFAULT_BLOCKS
    compute_dtype: Dtype = jnp.float32
    onehot_input: bool = False

    @nn.compact
    def __call__(self, observation: Array, deterministic: bool = True) -> Array:
        observation = expand_observation(observation, self.onehot_input)
        x = TowerWithHead(self.hidden_size, self.num_blocks, self.compute_dtype)(observation)
        logits = nn.Dense(self.codebook_size, dtype=jnp.float32, name="chance_logits")(x)
        if deterministic:
            one_hot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), self.codebook_size)
            return logits - jax.lax.stop_gradient(logits) + jax.lax.stop_gradient(one_hot)
        return jax.nn.softmax(logits)
