"""Pallas ring all-reduce vs XLA psum on the 8-virtual-device CPU mesh.

The remote DMAs run under TPU interpret mode (``pltpu.InterpretParams``),
which simulates cross-device copies + semaphores on CPU — the idiomatic
no-pod test for hand-rolled collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.parallel.ring import (
    psum_reference,
    ring_all_reduce,
)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    return jax.make_mesh((len(devs),), ("data",))


class TestRingAllReduce:
    def test_matches_psum(self, mesh):
        n = mesh.shape["data"]
        x = jax.random.normal(jax.random.PRNGKey(0), (n * 8, 128), jnp.float32)
        got = ring_all_reduce(x, mesh, interpret=True)
        want = psum_reference(x, mesh)
        # the ring accumulates in rotation order, psum as a tree: equal up to
        # float32 summation-order noise only
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_gradient_shaped_shards(self, mesh):
        # a (padded) gradient-like shard per device: sum replicated everywhere
        n = mesh.shape["data"]
        x = jnp.arange(n * 8 * 256, dtype=jnp.float32).reshape(n * 8, 256) / 1e3
        got = np.asarray(ring_all_reduce(x, mesh, interpret=True))
        shards = np.asarray(x).reshape(n, 8, 256)
        want = shards.sum(0)
        for d in range(n):
            np.testing.assert_allclose(got[d * 8 : (d + 1) * 8], want, rtol=1e-6)
