"""Categorical (two-hot) value/reward representation over an h-space support.

MuZero-canonical distributional heads (Schrittwieser et al. 2020, App. F):
instead of regressing a scalar with MSE, the head emits logits over a fixed
support of ``num_bins`` evenly spaced atoms and is trained with cross-entropy
toward a "two-hot" target — the target scalar's mass split between its two
neighbouring atoms so the expectation is exact. The reference uses scalar MSE
heads only (``reinforce/training/losses.py:134-177``); CE over a bounded
support is much better conditioned for 2048's heavy-tailed returns (raw
targets span 0..1e5 → h-space 0..~400, and a scalar MSE at init is ~750 —
see ``runs/r3_rean_*/train.log`` step 10).

Conventions:
- All atoms live in **h-space** (``ops.value_transform.scale_value``), like
  the scalar heads — the scalar-facing API (search, eval, priorities) is
  unchanged: ``expectation(logits)`` is an h-space scalar, un-transformed by
  the search layer exactly as scalar-head outputs are.
- The support is ``[0, support_max]``: 2048 has no negative rewards or
  returns, so symmetric supports would waste half the atoms.
- Targets beyond ``support_max`` clip to the last atom (standard MuZero
  behavior); pick ``support_max`` above the best plausible h-scaled return.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def support_atoms(num_bins: int, support_max: float) -> Array:
    """The ``num_bins`` evenly spaced h-space atoms on [0, support_max]."""
    return jnp.linspace(0.0, support_max, num_bins, dtype=jnp.float32)


def two_hot(scalar_h: Array, num_bins: int, support_max: float) -> Array:
    """Two-hot encode h-space scalars onto the support.

    Mass is split between the two atoms bracketing the (clipped) scalar so
    that the encoding's expectation equals the clipped scalar exactly.
    Returns shape ``scalar_h.shape + (num_bins,)``.
    """
    step = support_max / (num_bins - 1)
    x = jnp.clip(scalar_h, 0.0, support_max) / step
    low = jnp.floor(x)
    frac = x - low
    low_idx = low.astype(jnp.int32)
    high_idx = jnp.minimum(low_idx + 1, num_bins - 1)
    lo = jax.nn.one_hot(low_idx, num_bins, dtype=jnp.float32) * (1.0 - frac)[..., None]
    hi = jax.nn.one_hot(high_idx, num_bins, dtype=jnp.float32) * frac[..., None]
    return lo + hi


def expectation(logits: Array, support_max: float) -> Array:
    """softmax(logits) · atoms — the h-space scalar a categorical head
    represents. Inverse of :func:`two_hot` up to clipping/binning."""
    num_bins = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    return probs @ support_atoms(num_bins, support_max)


def categorical_loss(logits: Array, target_h: Array, support_max: float) -> Array:
    """Cross-entropy between the head's logits and two_hot(target_h)."""
    target = two_hot(target_h, logits.shape[-1], support_max)
    return -jnp.sum(target * jax.nn.log_softmax(logits, axis=-1), axis=-1)
