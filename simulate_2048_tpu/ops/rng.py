"""Counter-based PRNG spec for tile spawns.

The framework's stochasticity (tile spawns) is defined by ONE spec, implemented
twice — here in JAX (device path) and in ``simulate_2048_tpu.engine.rng`` in
pure NumPy (scalar oracle) — so batched TPU rollouts are bitwise-reproducible
against the host reference engine. This replaces the reference's two mutually
incompatible RNGs (NumPy PCG64DXSM at ``twentyfortyeight/core/gameboard.py:20``
vs. jax.random threefry at ``reinforce/game/core.py:174``) with a single
counter-based discipline, which is also what makes spawns cheap under jit:
no key-splitting chains, just ``hash(game_seed, spawn_index)``.

Spec
----
- Hash: Threefry-2x32, 20 rounds (the same bijection underlying jax.random).
- Spawn stream:  ``bits0, bits1 = threefry2x32((SPAWN_STREAM, game_seed), (spawn_index, 0))``
- Cell choice:   the ``mulhi32(bits0, num_empty)``-th empty cell in row-major
  order — floor(bits0·n/2³²), an int32-only uniform pick that lowers on
  NumPy, XLA, and Mosaic alike (see ``ops.board.spawn_rank``).
- Tile value:    4 (exponent 2) iff ``bits1 < FOUR_THRESHOLD`` else 2
  (exponent 1), with ``FOUR_THRESHOLD = round(0.1 * 2**32)`` — the 90/10 rule
  of ``gameboard.py:13``.
- A game consumes spawn indices 0,1 at reset (two initial tiles,
  ``twentyfortyeight.py:84``) and one index per valid move thereafter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# NOTE: module-level constants are host NumPy scalars, not jnp arrays —
# importing this module must not initialize a JAX backend.

# Stream discriminators keep independent uses of the hash decorrelated.
SPAWN_STREAM = np.uint32(0x2048_0001)
GAME_SEED_STREAM = np.uint32(0x2048_0002)

# P(spawn a 4) = 0.1 exactly as a uint32 threshold: round(0.1 * 2**32).
FOUR_THRESHOLD = np.uint32(429_496_730)

# Threefry-2x32 rotation distances (Salmon et al., SC'11).
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x: Array, d: int) -> Array:
    return (x << d) | (x >> (32 - d))


def threefry2x32(key: tuple[Array, Array], counter: tuple[Array, Array]) -> tuple[Array, Array]:
    """Threefry-2x32 (20 rounds). All inputs/outputs are uint32 arrays.

    Broadcasts elementwise over array-shaped keys/counters, so a whole batch of
    spawn decisions is one fused elementwise kernel on the VPU.
    """
    k0 = key[0].astype(jnp.uint32)
    k1 = key[1].astype(jnp.uint32)
    k2 = _PARITY ^ k0 ^ k1
    ks = (k0, k1, k2)

    x0 = counter[0].astype(jnp.uint32) + k0
    x1 = counter[1].astype(jnp.uint32) + k1

    for r in range(20):
        x0 = x0 + x1
        x1 = _rotl(x1, _ROTATIONS[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + jnp.uint32(j)

    return x0, x1


def spawn_bits(game_seed: Array, spawn_index: Array) -> tuple[Array, Array]:
    """Random bits for the ``spawn_index``-th tile spawn of a game.

    Parameters
    ----------
    game_seed : uint32 array
        Per-game seed (batch-shaped for batched envs).
    spawn_index : uint32/int32 array
        How many spawns this game has already consumed.

    Returns
    -------
    (bits0, bits1) : uint32 arrays, broadcast shape of the inputs.
    """
    zeros = jnp.zeros_like(jnp.broadcast_arrays(game_seed, spawn_index)[0], dtype=jnp.uint32)
    return threefry2x32(
        (jnp.broadcast_to(SPAWN_STREAM, zeros.shape), game_seed.astype(jnp.uint32)),
        (spawn_index.astype(jnp.uint32), zeros),
    )


def derive_game_seeds(run_seed: Array, board_index: Array, episode_index: Array) -> Array:
    """Per-(board, episode) game seed from a scalar run seed.

    Keeps every environment slot on an independent spawn stream even across
    auto-resets, with no key threading through the rollout loop.
    """
    b0, _ = threefry2x32(
        (jnp.broadcast_to(GAME_SEED_STREAM, jnp.shape(board_index)), jnp.broadcast_to(run_seed, jnp.shape(board_index)).astype(jnp.uint32)),
        (board_index.astype(jnp.uint32), episode_index.astype(jnp.uint32)),
    )
    return b0
