"""Pallas rollout kernel vs the XLA engine: bitwise differential test.

Runs the kernel in interpreter mode (CPU) and replays the identical
counter-RNG streams through the jnp env; boards, episode counts, and reward
sums must agree exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from simulate_2048_tpu.env import env as envlib
from simulate_2048_tpu.ops import board as ops
from simulate_2048_tpu.ops import rng as tfrng
from simulate_2048_tpu.ops.pallas_rollout import ACTION_STREAM, pallas_random_rollout


def xla_reference_rollout(seeds, num_steps):
    """Per-env replica of the kernel's loop using the standard env ops."""
    b = seeds.shape[0]
    state = envlib.reset(seeds)

    def body(carry, t):
        state, episodes, reward_sum, max_exp = carry
        bits0, _ = tfrng.threefry2x32(
            (jnp.full((b,), ACTION_STREAM, jnp.uint32), state.game_seed),
            (jnp.full((b,), t, jnp.uint32), state.spawn_count),
        )
        actions = (bits0 % 4).astype(jnp.int32)
        new_state, reward, done, _ = envlib.step_auto_reset(state, actions)
        episodes = episodes + done.astype(jnp.int32)
        reward_sum = reward_sum + reward
        max_exp = jnp.maximum(max_exp, jnp.max(new_state.board, axis=(-1, -2)))
        return (new_state, episodes, reward_sum, max_exp), None

    init = (state, jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.float32), jnp.zeros(b, jnp.int32))
    (state, episodes, reward_sum, max_exp), _ = jax.lax.scan(
        body, init, jnp.arange(num_steps, dtype=jnp.int32)
    )
    return state.board, episodes, reward_sum, max_exp


def test_pallas_rollout_bitwise_matches_xla_path():
    b, t = 128, 24
    seeds = tfrng.derive_game_seeds(
        jnp.uint32(7), jnp.arange(b, dtype=jnp.uint32), jnp.zeros(b, jnp.uint32)
    )
    kb, ke, kr, km = pallas_random_rollout(seeds, t, block_b=128, interpret=True)
    xb, xe, xr, xm = xla_reference_rollout(seeds, t)

    np.testing.assert_array_equal(np.asarray(ke), np.asarray(xe))
    np.testing.assert_array_equal(np.asarray(kb), np.asarray(xb))
    np.testing.assert_allclose(np.asarray(kr), np.asarray(xr), rtol=1e-6)
    max_tiles = np.where(np.asarray(xm) > 0, 2 ** np.asarray(xm), 0)
    np.testing.assert_array_equal(np.asarray(km), max_tiles)


def test_pallas_rollout_makes_progress():
    b, t = 128, 32
    seeds = jnp.arange(b, dtype=jnp.uint32)
    boards, episodes, rewards, max_tile = pallas_random_rollout(seeds, t, block_b=128, interpret=True)
    assert float(np.asarray(rewards).mean()) > 0
    assert int(np.asarray(max_tile).max()) >= 8
    # boards are valid exponent boards
    assert 0 <= int(np.asarray(boards).min()) and int(np.asarray(boards).max()) <= 16
