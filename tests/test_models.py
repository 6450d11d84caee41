"""Network shape/dtype contracts, straight-through encoder gradient, and
bundle utilities — coverage the reference lacked entirely (SURVEY.md §4:
"zero tests for neural models")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulate_2048_tpu.models import (
    Encoder,
    NetworkParams,
    count_parameters,
    create_network,
    update_params,
)

HID, BLOCKS, CODE = 64, 2, 32


@pytest.fixture(scope="module")
def network():
    return create_network(
        jax.random.PRNGKey(0), hidden_size=HID, num_blocks=BLOCKS, codebook_size=CODE
    )


def test_shapes_end_to_end(network):
    obs = jnp.zeros((3, 16))
    hidden = network.apply_fns.representation(network.params.representation, obs)
    assert hidden.shape == (3, HID)

    logits, value = network.apply_fns.prediction(network.params.prediction, hidden)
    assert logits.shape == (3, 4) and value.shape == (3,)

    action = jax.nn.one_hot(jnp.array([0, 1, 2]), 4)
    afterstate = network.apply_fns.afterstate_dynamics(
        network.params.afterstate_dynamics, hidden, action
    )
    assert afterstate.shape == (3, HID)

    q, chance_logits = network.apply_fns.afterstate_prediction(
        network.params.afterstate_prediction, afterstate
    )
    assert q.shape == (3,) and chance_logits.shape == (3, CODE)

    chance = jax.nn.one_hot(jnp.array([0, 1, 2]), CODE)
    next_hidden, reward = network.apply_fns.dynamics(network.params.dynamics, afterstate, chance)
    assert next_hidden.shape == (3, HID) and reward.shape == (3,)

    code = network.apply_fns.encoder(network.params.encoder, obs)
    assert code.shape == (3, CODE)


def test_encoder_straight_through(network):
    obs = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    code = network.apply_fns.encoder(network.params.encoder, obs)
    # Forward value is exactly one-hot.
    np.testing.assert_allclose(np.asarray(jnp.sum(code, axis=-1)), 1.0, rtol=1e-5)
    assert np.asarray((code == 1.0).sum(axis=-1)).tolist() == [1, 1]

    # Gradient flows to encoder parameters despite the argmax.
    def loss(params):
        c = network.apply_fns.encoder(params, obs)
        return jnp.sum(c * jnp.arange(CODE))

    grads = jax.grad(loss)(network.params.encoder)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert total > 0.0


def test_encoder_soft_mode():
    enc = Encoder(codebook_size=8, hidden_size=16, num_blocks=1)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
    soft = enc.apply(params, jnp.zeros((2, 16)), deterministic=False)
    np.testing.assert_allclose(np.asarray(jnp.sum(soft, axis=-1)), 1.0, rtol=1e-5)
    assert float(jnp.max(soft)) < 1.0


def test_count_and_update_params(network):
    n = count_parameters(network.params)
    assert n > 6 * HID * HID  # six towers of dense layers
    new_params = NetworkParams(*[jax.tree.map(lambda x: x * 0, p) for p in network.params])
    updated = update_params(network, new_params)
    assert count_parameters(updated.params) == n
    assert float(jax.tree.leaves(updated.params.prediction)[0].sum()) == 0.0


def test_jit_and_vmap_apply(network):
    fwd = jax.jit(
        lambda p, o: network.apply_fns.prediction(
            p, network.apply_fns.representation(network.params.representation, o)
        )
    )
    logits, value = fwd(network.params.prediction, jnp.zeros((5, 16)))
    assert logits.shape == (5, 4)


def test_bfloat16_compute_dtype():
    net = create_network(
        jax.random.PRNGKey(0), hidden_size=32, num_blocks=1, compute_dtype=jnp.bfloat16
    )
    logits, value = net.apply_fns.prediction(
        net.params.prediction, net.apply_fns.representation(net.params.representation, jnp.zeros((2, 16)))
    )
    # Heads emit float32 regardless of compute dtype.
    assert logits.dtype == jnp.float32 and value.dtype == jnp.float32
    # Params stay float32.
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(net.params))


def test_observation_onehot_lift():
    from simulate_2048_tpu.models.muzero import expand_observation

    obs = jnp.array([[0.0, 1 / 16.0, 11 / 16.0, 15 / 16.0]])
    oh = expand_observation(obs, True)
    assert oh.shape == (1, 64)
    oh = oh.reshape(1, 4, 16)
    assert oh[0, 0, 0] == 1.0 and oh[0, 1, 1] == 1.0
    assert oh[0, 2, 11] == 1.0 and oh[0, 3, 15] == 1.0
    assert float(oh.sum()) == 4.0
    # identity without the lift
    assert expand_observation(obs, False) is obs

    net = create_network(
        jax.random.PRNGKey(0), hidden_size=32, num_blocks=1, observation_onehot=True
    )
    hidden = net.apply_fns.representation(net.params.representation, jnp.zeros((3, 16)))
    assert hidden.shape == (3, 32)
    code = net.apply_fns.encoder(net.params.encoder, jnp.zeros((3, 16)))
    assert code.shape == (3, 32)
    # input layer widened 16 -> 256
    k = net.params.representation["params"]["TowerWithHead_0"]["Dense_0"]["kernel"]
    assert k.shape[0] == 256
