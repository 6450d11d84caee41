"""The two Threefry implementations (jnp device path, NumPy oracle path) must
be bit-identical — everything downstream (seed-exact rollout parity) rests on
this."""

import jax.numpy as jnp
import numpy as np

from simulate_2048_tpu.engine import rng as nprng
from simulate_2048_tpu.ops import rng as jrng


def test_threefry_cross_implementation_parity():
    rs = np.random.RandomState(123)
    n = 256
    k0 = rs.randint(0, 2**32, size=n, dtype=np.uint32)
    k1 = rs.randint(0, 2**32, size=n, dtype=np.uint32)
    c0 = rs.randint(0, 2**32, size=n, dtype=np.uint32)
    c1 = rs.randint(0, 2**32, size=n, dtype=np.uint32)

    j0, j1 = jrng.threefry2x32((jnp.asarray(k0), jnp.asarray(k1)), (jnp.asarray(c0), jnp.asarray(c1)))
    n0, n1 = nprng.threefry2x32_np((k0, k1), (c0, c1))

    np.testing.assert_array_equal(np.asarray(j0), n0)
    np.testing.assert_array_equal(np.asarray(j1), n1)


def test_threefry_matches_jax_reference():
    # jax.random is built on the same Threefry-2x32 bijection; cross-check
    # against jax's internal implementation as an independent oracle.
    from jax._src import prng as jax_prng

    rs = np.random.RandomState(7)
    for _ in range(16):
        k = rs.randint(0, 2**32, size=2, dtype=np.uint32)
        c = rs.randint(0, 2**32, size=2, dtype=np.uint32)
        ref = jax_prng.threefry_2x32(jnp.asarray(k), jnp.asarray(c))
        mine = nprng.threefry2x32_np((k[0], k[1]), (c[0], c[1]))
        assert int(ref[0]) == int(mine[0]) and int(ref[1]) == int(mine[1])


def test_spawn_bits_parity_and_determinism():
    seeds = np.arange(100, dtype=np.uint32)
    idx = np.full(100, 3, dtype=np.uint32)
    j0, j1 = jrng.spawn_bits(jnp.asarray(seeds), jnp.asarray(idx))
    n0, n1 = nprng.spawn_bits_np(seeds, idx)
    np.testing.assert_array_equal(np.asarray(j0), n0)
    np.testing.assert_array_equal(np.asarray(j1), n1)
    # Distinct seeds give distinct streams.
    assert len(np.unique(n0)) == 100


def test_four_threshold_probability():
    # The uint32 threshold encodes P(4) = 0.1 to within 2**-32.
    assert abs(int(nprng.FOUR_THRESHOLD) / 2**32 - 0.1) < 1e-9


def test_derive_game_seeds_parity():
    board_idx = np.arange(64, dtype=np.uint32)
    ep = np.zeros(64, dtype=np.uint32)
    j = jrng.derive_game_seeds(jnp.uint32(42), jnp.asarray(board_idx), jnp.asarray(ep))
    n = nprng.derive_game_seeds_np(42, board_idx, ep)
    np.testing.assert_array_equal(np.asarray(j), n)
