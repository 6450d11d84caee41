"""On-device self-play: MCTS-driven trajectory generation under one jit.

The reference drives self-play from host Python — one MCTS dispatch, one env
step, and several device→host copies per move (``reinforce/training/
self_play.py:258-391``). Here a whole generation batch is a single jitted
``lax.scan`` over time: batched search, action sampling, env stepping, and
trajectory recording all stay on device; the host sees only the finished
``Trajectory`` batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from simulate_2048_tpu.env import env as envlib
from simulate_2048_tpu.models.network import NetworkApplyFns, NetworkParams
from simulate_2048_tpu.ops import board as ops
from simulate_2048_tpu.search.mcts import SearchConfig, _search_single
from simulate_2048_tpu.search.policy import get_policy_target, sample_from_visits
from simulate_2048_tpu.training.config import TrainConfig
from simulate_2048_tpu.training.replay import Trajectory

Array = jax.Array


def search_config_from(config: TrainConfig) -> SearchConfig:
    """Lift the MCTS block of a TrainConfig into a SearchConfig."""
    return SearchConfig(
        num_simulations=config.num_simulations,
        num_actions=config.action_size,
        codebook_size=config.codebook_size,
        discount=config.discount,
        dirichlet_alpha=config.dirichlet_alpha,
        dirichlet_fraction=config.dirichlet_fraction,
        pb_c_init=config.pb_c_init,
        pb_c_base=config.pb_c_base,
    )


@partial(jax.jit, static_argnums=(1, 4, 5, 6))
def play_games(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    temperature: Array,
    config: TrainConfig,
    num_games: int,
    greedy: bool = False,
) -> Trajectory:
    """Play ``num_games`` episodes in lockstep with batched MCTS.

    - Policy targets are stored at temperature 1.0 while actions are sampled
      at the scheduled ``temperature`` — the reference's (intentional,
      MuZero-style) split (``self_play.py:124-126``).
    - ``greedy=True`` disables Dirichlet noise and forces argmax actions
      (evaluation mode, cf. ``self_play.py:460-521``).
    - ``temperature`` is traced, so one compiled program serves the whole
      schedule.

    Returns a :class:`Trajectory` batch of fixed capacity
    ``config.max_trajectory_length`` with per-episode ``length``.
    """
    t_max = config.max_trajectory_length
    cfg = search_config_from(config)
    if greedy:
        cfg = cfg._replace(dirichlet_fraction=0.0)

    key, reset_key = jax.random.split(key)
    run_seed = jax.random.randint(reset_key, (), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    state = envlib.reset_batch(run_seed, num_games)

    def body(carry, step_key):
        state = carry
        obs = envlib.get_observation(state)
        legal = envlib.get_legal_actions(state)
        active = ~state.done

        search_keys = jax.random.split(step_key, num_games + 1)
        out = jax.vmap(lambda o, k: _search_single(params, apply_fns, o, k, cfg, None))(
            obs, search_keys[:num_games]
        )

        # Train target at temperature 1.0 (``self_play.py:124``).
        policy_target = jax.vmap(lambda po, m: get_policy_target(po, m, 1.0))(out, legal)

        if greedy:
            actions = jnp.argmax(jnp.where(legal, out.action_weights, 0.0), axis=-1)
        else:
            actions = jax.vmap(sample_from_visits, in_axes=(0, 0, 0, None))(
                out, jax.random.split(search_keys[num_games], num_games), legal, temperature
            )

        new_state, reward, done, _ = envlib.step(state, actions)
        record = (
            state.board.astype(jnp.int8).reshape(num_games, 16),
            actions.astype(jnp.int8),
            reward,
            policy_target,
            out.search_value,
            active,
        )
        return new_state, record

    step_keys = jax.random.split(key, t_max)
    final_state, (boards, actions, rewards, policies, values, active) = jax.lax.scan(
        body, state, step_keys
    )

    # (T, B, …) → (B, T, …); close the board tape with the final board.
    to_bt = lambda x: jnp.moveaxis(x, 0, 1)
    boards = jnp.concatenate(
        [to_bt(boards), final_state.board.astype(jnp.int8).reshape(num_games, 1, 16)], axis=1
    )
    active = to_bt(active)
    lengths = jnp.sum(active.astype(jnp.int32), axis=-1)

    return Trajectory(
        boards=boards,
        actions=to_bt(actions) * active.astype(jnp.int8),
        rewards=to_bt(rewards) * active,
        policies=to_bt(policies) * active[..., None],
        values=to_bt(values) * active,
        length=lengths,
        total_reward=final_state.total_reward,
        max_tile=ops.max_tile(boards[:, -1].reshape(num_games, 4, 4).astype(jnp.int32)),
    )


def generate_games(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    config: TrainConfig,
    training_step: int,
    num_games: int | None = None,
) -> Trajectory:
    """Self-play generation entry point (``self_play.py:396-457``).

    With ``config.value_target_mode == "td_lambda"`` the stored value targets
    are TD(λ) n-step returns over the finished trajectories instead of raw
    search values (see :func:`compute_n_step_returns`).
    """
    temperature = jnp.float32(config.get_temperature(training_step))
    n = num_games or config.num_parallel_games
    traj = play_games(params, apply_fns, key, temperature, config, n, False)
    if config.value_target_mode == "td_lambda":
        returns = compute_n_step_returns(traj.rewards, traj.values, traj.length, config)
        traj = traj._replace(values=returns)
    return traj


def evaluate_games(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    config: TrainConfig,
    num_games: int | None = None,
) -> dict[str, Any]:
    """Greedy evaluation rollouts with summary stats (``self_play.py:460-521``)."""
    import numpy as np

    n = num_games or config.eval_games
    traj = play_games(params, apply_fns, key, jnp.float32(0.0), config, n, True)
    rewards = np.asarray(traj.total_reward)
    tiles = np.asarray(traj.max_tile)

    # VQ-VAE health: how many distinct chance codes the encoder assigns to the
    # observations seen in eval. 1 = code collapse (the stochastic model has
    # degenerated to deterministic — functionally the reference's placeholder
    # behavior); healthy runs use a spread of the 32 codes.
    obs = traj.boards[:, :-1].astype(jnp.float32) / 16.0
    encode = jax.jit(lambda p, o: jnp.argmax(apply_fns.encoder(p, o), axis=-1))
    code_ids = np.asarray(encode(params.encoder, obs.reshape(-1, obs.shape[-1])))
    active = np.asarray(traj.length)[:, None] > np.arange(obs.shape[1])[None, :]
    used = np.unique(code_ids.reshape(active.shape)[active])

    # Per-move search diagnostics over active steps: the stored policy
    # targets at temperature 1.0 ARE the root visit distributions, so their
    # entropy measures how decided the search is (ln 4 ≈ 1.386 = uniform);
    # the stored values are the backed-up root values.
    policies = np.asarray(traj.policies)  # (B, T, A)
    values = np.asarray(traj.values)  # (B, T)
    act = active  # (B, T) bool
    entropy = -(policies * np.log(np.maximum(policies, 1e-12))).sum(-1)

    stats: dict[str, Any] = {
        "mean_reward": float(rewards.mean()),
        "std_reward": float(rewards.std()),
        "max_reward": float(rewards.max()),
        "mean_max_tile": float(tiles.mean()),
        "max_tile": int(tiles.max()),
        "mean_length": float(np.asarray(traj.length).mean()),
        "encoder_codes_used": int(used.size),
        "mean_search_entropy": float(entropy[act].mean()) if act.any() else 0.0,
        "mean_search_value": float(values[act].mean()) if act.any() else 0.0,
    }
    for tile in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
        stats[f"reached_{tile}"] = int((tiles >= tile).sum())
    return stats


def play_game(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    config: TrainConfig,
    training_step: int = 0,
    greedy: bool = False,
) -> Trajectory:
    """Play ONE game (``self_play.py:51-162`` counterpart): a batch-1 call of
    :func:`play_games`; fields keep their leading batch dim of 1."""
    temperature = jnp.float32(config.get_temperature(training_step))
    return play_games(params, apply_fns, key, temperature, config, 1, greedy)


def warmup_self_play(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    config: TrainConfig,
    num_games: int | None = None,
) -> float:
    """Trigger compilation of the self-play program with dummy inputs.

    Counterpart of the reference's ``warmup_mcts``/``warmup_batched_mcts``
    (``self_play.py:165-255``). With the persistent compilation cache this is
    usually a no-op after the first ever run; returns elapsed seconds.
    """
    import time

    n = num_games or config.num_parallel_games
    t0 = time.perf_counter()
    traj = play_games(
        params, apply_fns, jax.random.PRNGKey(0), jnp.float32(1.0), config, n, False
    )
    jax.block_until_ready(traj.length)
    return time.perf_counter() - t0


@partial(jax.jit, static_argnums=(3,))
def compute_n_step_returns(
    rewards: Array, values: Array, lengths: Array, config: TrainConfig
) -> Array:
    """TD(λ) n-step value targets over a trajectory batch.

    z_t = Σ_{i<n} γ^i r_{t+i} + γ^n [(1-λ)·v + λ·(bootstrap chain)] — the
    reference defines this but never calls it (``self_play.py:524-579``);
    here it is a working, tested alternative to raw search-value targets.

    Implemented as a backward scan of the TD(λ) recursion
    G_t = r_t + γ[(1-λ) v_{t+1} + λ G_{t+1}], truncated at episode end.
    """
    gamma, lam = config.discount, config.td_lambda
    t_max = rewards.shape[-1]
    steps = jnp.arange(t_max)
    in_ep = steps[None, :] < lengths[:, None]  # (B, T)

    v_next = jnp.concatenate([values[:, 1:], jnp.zeros_like(values[:, :1])], axis=-1)
    v_next = jnp.where(
        steps[None, :] + 1 < lengths[:, None], v_next, 0.0
    )  # terminal bootstrap = 0

    def backward(carry, xs):
        g_next = carry
        r, vn, mask = xs
        g = r + gamma * ((1 - lam) * vn + lam * g_next)
        g = jnp.where(mask, g, 0.0)
        return g, g

    xs = (
        jnp.moveaxis(rewards, 1, 0)[::-1],
        jnp.moveaxis(v_next, 1, 0)[::-1],
        jnp.moveaxis(in_ep, 1, 0)[::-1],
    )
    _, gs = jax.lax.scan(backward, jnp.zeros(rewards.shape[0]), xs)
    return jnp.moveaxis(gs[::-1], 0, 1)
