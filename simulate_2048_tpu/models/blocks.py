"""Shared building blocks: pre-activation dense residual tower.

Architecture matches the reference (``reinforce/neural/models.py:35-102``:
LayerNorm → ReLU → Dense → LayerNorm → ReLU → Dense → +residual, stacked),
with TPU-first numerics: activations/matmuls run in a configurable compute
dtype (bfloat16 by default in the full config — MXU native), parameters and
LayerNorm statistics stay float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
Dtype = Any


class DenseResidualBlock(nn.Module):
    """ResNet-v2 pre-activation block over dense layers (``models.py:35-79``)."""

    features: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        # LayerNorm in float32 for stable statistics, then cast down.
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dense(self.features, dtype=self.compute_dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dense(self.features, dtype=self.compute_dtype)(x)
        return x + residual


class ResidualTower(nn.Module):
    """Stack of :class:`DenseResidualBlock` (``models.py:82-102``)."""

    num_blocks: int
    features: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(self.num_blocks):
            x = DenseResidualBlock(self.features, self.compute_dtype)(x)
        return x


class TowerWithHead(nn.Module):
    """Project → tower → LN/ReLU trunk shared by every network.

    Factored out because all six reference networks repeat the same skeleton
    (``models.py:105-443``); heads are attached by callers.
    """

    hidden_size: int
    num_blocks: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden_size, dtype=self.compute_dtype)(x)
        x = ResidualTower(self.num_blocks, self.hidden_size, self.compute_dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return nn.relu(x)
