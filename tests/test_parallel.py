"""Sharded execution correctness on the virtual 8-device mesh: data-parallel
results must match single-device results (the whole point of DP-by-sharding
is that it is semantically invisible)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    make_sharded_rollout,
    shard_pytree_batch,
)
from simulate_2048_tpu.training import (
    create_optimizer,
    create_train_state,
    init_buffer,
    sample_batch,
    tiny_config,
    train_step,
)
from simulate_2048_tpu.training.replay import add_trajectories
from tests.test_training import make_trajectories

CFG = replace(
    tiny_config(), hidden_size=32, num_residual_blocks=1, batch_size=16, replay_buffer_size=64
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"
    return make_mesh(jax.devices()[:8])


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_rollout_matches_single_device(mesh):
    n_envs, n_steps = 64, 16
    sharded = make_sharded_rollout(mesh, n_envs, n_steps)
    steps_s, reward_s, tile_s = jax.device_get(sharded(jnp.uint32(5)))

    single = make_sharded_rollout(make_mesh(jax.devices()[:1]), n_envs, n_steps)
    steps_1, reward_1, tile_1 = jax.device_get(single(jnp.uint32(5)))

    assert int(steps_s) == int(steps_1) == n_envs * n_steps
    np.testing.assert_allclose(float(reward_s), float(reward_1), rtol=1e-5)
    assert int(tile_s) == int(tile_1)


def test_dp_train_step_matches_single_device(mesh):
    state, network = create_train_state(jax.random.PRNGKey(0), CFG)
    optimizer = create_optimizer(CFG)
    buffer = add_trajectories(init_buffer(CFG), make_trajectories(32, 20, CFG))
    batch, _, weights = sample_batch(buffer, jax.random.PRNGKey(1), CFG.batch_size, CFG)

    # Single-device reference (fresh state copy: train_step donates).
    state_a = jax.tree.map(jnp.copy, state)
    new_a, loss_a, prio_a = train_step(
        state_a, network.apply_fns, batch, weights, CFG, optimizer
    )

    with mesh:
        dp_step = make_dp_train_step(network.apply_fns, CFG, optimizer, mesh)
        state_b = jax.tree.map(jnp.copy, state)
        new_b, loss_b, prio_b = dp_step(
            state_b, shard_pytree_batch(batch, mesh), shard_pytree_batch(weights, mesh)
        )

    np.testing.assert_allclose(
        float(loss_a.total_loss), float(loss_b.total_loss), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(prio_a), np.asarray(prio_b), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_a.params), jax.tree.leaves(new_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_train_superstep_matches_single_device(mesh):
    """The fused DP superstep (round 4: a mesh no longer forces per-step
    dispatch) must agree with the single-device fused path: same sampling
    keys => same batches => same final state/losses up to cross-shard
    reduction order."""
    from simulate_2048_tpu.parallel import make_dp_train_superstep
    from simulate_2048_tpu.training.learner import train_superstep

    chunk = 3
    state, network = create_train_state(jax.random.PRNGKey(0), CFG)
    optimizer = create_optimizer(CFG)
    buffer = add_trajectories(init_buffer(CFG), make_trajectories(32, 20, CFG))
    key = jax.random.PRNGKey(7)

    state_a = jax.tree.map(jnp.copy, state)
    buf_a = jax.tree.map(jnp.copy, buffer)
    new_a, buf_a, loss_a = train_superstep(
        state_a, buf_a, key, network.apply_fns, CFG, optimizer, chunk
    )

    with mesh:
        superstep = make_dp_train_superstep(network.apply_fns, CFG, optimizer, mesh, chunk)
        new_b, buf_b, loss_b = superstep(jax.tree.map(jnp.copy, state), buffer, key)

    assert int(new_a.step) == int(new_b.step) == chunk
    np.testing.assert_allclose(
        float(loss_a.total_loss), float(loss_b.total_loss), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(new_a.params), jax.tree.leaves(new_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    # Priority refreshes touched the same rows.
    np.testing.assert_allclose(
        np.asarray(buf_a.step_priorities, np.float32),
        np.asarray(buf_b.step_priorities, np.float32),
        rtol=2e-2,
        atol=1e-3,
    )
