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
from typing import Any, NamedTuple

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


class GenStats(NamedTuple):
    """On-device collection diagnostics for one self-play segment.

    The round-2 soaks all peaked at their first eval then declined
    (docs/project.md) with no collection-side signal logged to localize the
    regression — these are the aggregates needed to tell *data* drift
    (completed-game scores, policy-target entropy) from *target* drift
    (search values vs TD targets). Sums + counts, so the host computes means
    after a single small transfer.
    """

    completed: Array  # games finished inside this segment
    completed_score_sum: Array  # their full-game scores (env total_reward)
    completed_length_sum: Array  # their full-game lengths (moves)
    active_positions: Array  # stored (non-padding) positions in the segment
    policy_entropy_sum: Array  # entropy of stored policy targets
    search_value_sum: Array  # raw-space MCTS root values ν
    # Per-lane ν at the segment's FIRST position (pre-TD-replacement) — the
    # (1−λ) bootstrap piece when a previous truncated segment's targets are
    # backfilled with this segment's grounding (replay.backfill_returns).
    first_search_value: Array  # (B,)


def search_config_from(config: TrainConfig, eval_mode: bool = False) -> SearchConfig:
    """Lift the MCTS block of a TrainConfig into a SearchConfig.

    With ``eval_mode=True``, the eval-only calibration overrides
    ``eval_prior_temperature`` / ``eval_pb_c_init`` replace the training
    values when set: the round-2 sweep measured prior_temperature=4 +
    pb_c_init=0.5 worth ~+750 eval on a trained checkpoint while the same
    knobs at COLLECTION time are harmful from scratch (docs/project.md), so
    calibration applies to greedy evaluation searches only.
    """
    prior_temperature = config.prior_temperature
    pb_c_init = config.pb_c_init
    # Gumbel root selection is a COLLECTION-search lever: evaluation always
    # runs PUCT (+ the calibration overrides below), so eval protocols stay
    # identical across root-selection arms and across rounds.
    root_selection = config.root_selection
    if eval_mode:
        if config.eval_prior_temperature is not None:
            prior_temperature = config.eval_prior_temperature
        if config.eval_pb_c_init is not None:
            pb_c_init = config.eval_pb_c_init
        root_selection = "puct"
    return SearchConfig(
        num_simulations=config.num_simulations,
        num_actions=config.action_size,
        codebook_size=config.codebook_size,
        discount=config.discount,
        dirichlet_alpha=config.dirichlet_alpha,
        dirichlet_fraction=config.dirichlet_fraction,
        pb_c_init=pb_c_init,
        pb_c_base=config.pb_c_base,
        max_depth=config.search_max_depth,
        root_selection=root_selection,
        gumbel_c_visit=config.gumbel_c_visit,
        gumbel_c_scale=config.gumbel_c_scale,
        chance_selection=config.chance_selection,
        pw_c=config.pw_c,
        pw_alpha=config.pw_alpha,
        prior_temperature=prior_temperature,
        value_transform_epsilon=(
            config.value_epsilon if config.search_untransform_values else None
        ),
        value_bins=config.value_bins,
        reward_bins=config.reward_bins,
        value_support_max=config.value_support_max,
        reward_support_max=config.reward_support_max,
    )


@partial(jax.jit, static_argnums=(1, 5, 6, 7, 8))
def play_segment(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    env_state: "envlib.GameState",
    key: Array,
    temperature: Array,
    config: TrainConfig,
    num_games: int,
    greedy: bool = False,
    num_steps: int | None = None,
) -> tuple["envlib.GameState", Trajectory, GenStats]:
    """Play one trajectory SEGMENT from wherever the games currently are.

    The reference caps whole games at 200 moves (``self_play.py:314`` — its
    trajectory capacity doubles as a game-length cap, so its agents can never
    score past a ~200-move game). Here the cap is per SEGMENT, as in the
    paper's buffer spec: games carry over between calls via ``env_state``;
    a game that ends inside the segment is flagged ``terminated`` and its
    lane restarts (deterministically reseeded) at the segment boundary, while
    unfinished games continue in the next segment.

    - Policy targets are stored at temperature 1.0 while actions are sampled
      at the scheduled ``temperature`` — the reference's (intentional,
      MuZero-style) split (``self_play.py:124-126``).
    - ``greedy=True`` disables Dirichlet noise and forces argmax actions
      (evaluation mode, cf. ``self_play.py:460-521``).
    - ``temperature`` is traced, so one compiled program serves the whole
      schedule.

    Returns ``(next_env_state, trajectory, gen_stats)``; the trajectory's
    ``total_reward`` is the reward earned within this segment and
    ``gen_stats`` carries the on-device collection diagnostics
    (:class:`GenStats`; finish with :func:`finish_gen_stats`).
    """
    t_max = num_steps or config.max_trajectory_length
    # greedy ⇔ evaluation semantics: the eval-only search-calibration
    # overrides apply and root Dirichlet noise is disabled.
    cfg = search_config_from(config, eval_mode=greedy)
    if greedy:
        cfg = cfg._replace(dirichlet_fraction=0.0)

    # Search backend: the whole-search Pallas kernel keeps tree tables +
    # packed weights in VMEM (1.89× the XLA search at B=1024×64 sims,
    # docs/project.md). Weights are packed ONCE per play_segment call (i.e.
    # per parameter version), outside the scan.
    packed = None
    use_pallas = False
    if config.search_backend != "xla":
        from simulate_2048_tpu.ops import pallas_search

        wdtype = (
            jnp.bfloat16 if config.search_weight_dtype == "bfloat16" else jnp.float32
        )
        plan = pallas_search.pallas_search_plan(
            cfg, config.hidden_size, config.num_residual_blocks, num_games, wdtype
        )
        if config.search_backend == "pallas" and plan is None:
            raise ValueError(
                "search_backend='pallas' but the config is outside the kernel's "
                "scope (needs argmax chance selection, pw_c=None, batch % "
                f"{pallas_search.BLOCK_G} == 0, and a VMEM fit — estimated "
                f"{pallas_search.search_vmem_bytes(cfg, config.hidden_size, config.num_residual_blocks, wdtype) >> 20} MB resident)"
            )
        # "auto" engages only on TPU: interpret mode off-TPU is far slower
        # than the XLA search and exists for differential tests only.
        use_pallas = plan is not None and (
            config.search_backend == "pallas" or not pallas_search.default_interpret()
        )
        if use_pallas:
            stream_chunk = plan if plan else None
            packed = pallas_search.pack_search_params(
                params,
                config.num_residual_blocks,
                max(config.action_size, config.codebook_size),
                wdtype,
                stream_chunk,
                value_bins=config.value_bins,
                reward_bins=config.reward_bins,
            )

    state = env_state
    initial_total = state.total_reward

    def body(carry, step_key):
        state = carry
        obs = envlib.get_observation(state)
        legal = envlib.get_legal_actions(state)
        active = ~state.done

        # Root legality masking: simulations never visit illegal root actions
        # (the reference passes no mask here, ``self_play.py:108`` — wasting
        # simulations on moves the learned model cannot know are no-ops).
        search_keys = jax.random.split(step_key, num_games + 1)
        if use_pallas:
            from simulate_2048_tpu.ops import pallas_search

            out = pallas_search.run_mcts_pallas(
                params,
                apply_fns,
                obs,
                search_keys[:num_games],
                cfg,
                ~legal,
                num_blocks=config.num_residual_blocks,
                packed=packed,
                interpret=pallas_search.default_interpret(),
                stream_chunk=stream_chunk,
            )
        else:
            out = jax.vmap(
                lambda o, k, inv: _search_single(params, apply_fns, o, k, cfg, inv)
            )(obs, search_keys[:num_games], ~legal)

        # Train target at temperature 1.0 (``self_play.py:124``).
        policy_target = jax.vmap(lambda po, m: get_policy_target(po, m, 1.0))(out, legal)

        if greedy:
            actions = jnp.argmax(jnp.where(legal, out.action_weights, 0.0), axis=-1)
        else:
            if config.temperature_move_cutoff is not None:
                # Opening-only exploration: greedy past the per-game cutoff
                # (temperature 0 ⇒ argmax inside sample_from_visits).
                temps = jnp.where(
                    state.step_count < config.temperature_move_cutoff, temperature, 0.0
                )
            else:
                temps = jnp.full((num_games,), temperature)
            actions = jax.vmap(sample_from_visits)(
                out, jax.random.split(search_keys[num_games], num_games), legal, temps
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

    values_bt = to_bt(values) * active
    rewards_bt = to_bt(rewards) * active
    priorities = collection_priorities(
        rewards_bt, values_bt, lengths, config, final_state.done
    )

    traj = Trajectory(
        boards=boards,
        actions=to_bt(actions) * active.astype(jnp.int8),
        rewards=rewards_bt,
        policies=to_bt(policies) * active[..., None],
        values=values_bt,
        priorities=priorities,
        length=lengths,
        terminated=final_state.done,
        total_reward=final_state.total_reward - initial_total,
        max_tile=ops.max_tile(boards[:, -1].reshape(num_games, 4, 4).astype(jnp.int32)),
    )

    # Collection diagnostics, before dead lanes are reseeded (every lane is
    # active at segment entry, so done-at-end ⇔ the game finished here).
    policies_bt = traj.policies
    entropy = -jnp.sum(policies_bt * jnp.log(jnp.maximum(policies_bt, 1e-12)), axis=-1)
    done = final_state.done
    stats = GenStats(
        completed=jnp.sum(done.astype(jnp.int32)),
        completed_score_sum=jnp.sum(jnp.where(done, final_state.total_reward, 0.0)),
        completed_length_sum=jnp.sum(jnp.where(done, final_state.step_count, 0)),
        active_positions=jnp.sum(lengths),
        policy_entropy_sum=jnp.sum(entropy * active),
        search_value_sum=jnp.sum(values_bt),
        first_search_value=values_bt[:, 0],
    )
    return envlib.reset_done(final_state), traj, stats


@partial(jax.jit, static_argnums=(1, 4, 5, 6, 7))
def play_games(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    temperature: Array,
    config: TrainConfig,
    num_games: int,
    greedy: bool = False,
    num_steps: int | None = None,
) -> Trajectory:
    """Play ``num_games`` FRESH episodes in lockstep (one segment from reset).

    Stateless convenience over :func:`play_segment`; pass ``num_steps`` to
    run longer than one buffer segment (evaluation uses
    ``config.eval_max_moves`` so measured strength is not clipped by the
    segment cap).
    """
    key, reset_key = jax.random.split(key)
    run_seed = jax.random.randint(reset_key, (), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    state = envlib.reset_batch(run_seed, num_games)
    _, traj, _ = play_segment(
        params, apply_fns, state, key, temperature, config, num_games, greedy, num_steps
    )
    return traj


def generate_games(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    config: TrainConfig,
    training_step: int,
    num_games: int | None = None,
    env_state: "envlib.GameState | None" = None,
) -> "tuple[envlib.GameState, Trajectory, GenStats] | Trajectory":
    """Self-play generation entry point (``self_play.py:396-457``).

    With ``env_state`` given, plays one SEGMENT continuing those games and
    returns ``(next_env_state, trajectory, gen_stats)`` — the trainer threads
    the state so games span generations instead of being capped at one
    segment, and logs the :class:`GenStats` collection diagnostics. Without
    it, plays fresh episodes and returns just the trajectory (stateless,
    reference-shaped API).

    With ``config.value_target_mode == "td_lambda"`` the stored value targets
    are TD(λ) n-step returns over the trajectories instead of raw search
    values (see :func:`compute_n_step_returns`).
    """
    temperature = jnp.float32(config.get_temperature(training_step))
    n = num_games or config.num_parallel_games
    if env_state is not None:
        next_state, traj, stats = play_segment(
            params, apply_fns, env_state, key, temperature, config, n, False
        )
    else:
        traj = play_games(params, apply_fns, key, temperature, config, n, False)
    if config.value_target_mode == "td_lambda":
        returns = compute_n_step_returns(
            traj.rewards, traj.values, traj.length, config, traj.terminated
        )
        traj = traj._replace(values=returns)
    return (next_state, traj, stats) if env_state is not None else traj


def finish_gen_stats(stats: GenStats, traj: Trajectory) -> dict[str, float]:
    """Collection diagnostics → loggable means (one small host transfer).

    ``traj`` must be the trajectory generate_games returned alongside
    ``stats`` — its ``values`` hold the final stored TARGETS (TD(λ) returns
    in td_lambda mode), so target scale and |ν − z| calibration are logged
    per generation too.
    """
    import numpy as np

    n_pos = max(int(stats.active_positions), 1)
    n_done = max(int(stats.completed), 1)
    targets = np.asarray(traj.values, np.float32)
    priorities = np.asarray(traj.priorities, np.float32)
    return {
        "gen/completed_games": int(stats.completed),
        "gen/completed_score": float(stats.completed_score_sum) / n_done,
        "gen/completed_length": float(stats.completed_length_sum) / n_done,
        "gen/positions": int(stats.active_positions),
        "gen/policy_entropy": float(stats.policy_entropy_sum) / n_pos,
        "gen/search_value": float(stats.search_value_sum) / n_pos,
        "gen/value_target": float(targets.sum()) / n_pos,
        "gen/priority": float(priorities.sum()) / n_pos,
    }


@partial(jax.jit, static_argnums=(1, 4, 5))
def _evaluate_rollout(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    run_seed: Array,
    config: TrainConfig,
    num_games: int,
):
    """Greedy full-game rollouts as a ``while_loop`` with streaming stats.

    Unlike training segments (fixed-length scan recording a tape), evaluation
    needs only summary statistics — a while-loop stops as soon as every game
    ends (up to ``eval_max_moves``) and accumulates search entropy / values /
    encoder code usage on the fly, so eval cost tracks actual game length.
    """
    cfg = search_config_from(config, eval_mode=True)._replace(dirichlet_fraction=0.0)
    state = envlib.reset_batch(run_seed, num_games)

    # Same backend dispatch as play_segment (Pallas engages for lane-aligned
    # eval batches on TPU; the 32-game default stays on the XLA path).
    packed = None
    use_pallas = False
    if config.search_backend != "xla":
        from simulate_2048_tpu.ops import pallas_search

        wdtype = (
            jnp.bfloat16 if config.search_weight_dtype == "bfloat16" else jnp.float32
        )
        plan = pallas_search.pallas_search_plan(
            cfg, config.hidden_size, config.num_residual_blocks, num_games, wdtype
        )
        use_pallas = plan is not None and (
            config.search_backend == "pallas" or not pallas_search.default_interpret()
        )
        if use_pallas:
            stream_chunk = plan if plan else None
            packed = pallas_search.pack_search_params(
                params,
                config.num_residual_blocks,
                max(config.action_size, config.codebook_size),
                wdtype,
                stream_chunk,
                value_bins=config.value_bins,
                reward_bins=config.reward_bins,
            )

    def cond(carry):
        state, t, *_ = carry
        return jnp.any(~state.done) & (t < config.eval_max_moves)

    def body(carry):
        state, t, k, ent_sum, val_sum, n_active, codes_used = carry
        obs = envlib.get_observation(state)
        legal = envlib.get_legal_actions(state)
        active = ~state.done

        k, sub = jax.random.split(k)
        search_keys = jax.random.split(sub, num_games)
        if use_pallas:
            from simulate_2048_tpu.ops import pallas_search

            out = pallas_search.run_mcts_pallas(
                params,
                apply_fns,
                obs,
                search_keys,
                cfg,
                ~legal,
                num_blocks=config.num_residual_blocks,
                packed=packed,
                interpret=pallas_search.default_interpret(),
                stream_chunk=stream_chunk,
            )
        else:
            out = jax.vmap(
                lambda o, kk, inv: _search_single(params, apply_fns, o, kk, cfg, inv)
            )(obs, search_keys, ~legal)
        actions = jnp.argmax(jnp.where(legal, out.action_weights, 0.0), axis=-1)

        # Streaming diagnostics (active games only).
        probs = jax.vmap(lambda po, m: get_policy_target(po, m, 1.0))(out, legal)
        entropy = -jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-12)), axis=-1)
        ent_sum = ent_sum + jnp.sum(jnp.where(active, entropy, 0.0))
        val_sum = val_sum + jnp.sum(jnp.where(active, out.search_value, 0.0))
        n_active = n_active + jnp.sum(active.astype(jnp.int32))
        code = jnp.argmax(apply_fns.encoder(params.encoder, obs), axis=-1)
        hit = jax.nn.one_hot(code, config.codebook_size, dtype=jnp.bool_) & active[:, None]
        codes_used = codes_used | jnp.any(hit, axis=0)

        new_state, _, _, _ = envlib.step(state, actions)
        return new_state, t + 1, k, ent_sum, val_sum, n_active, codes_used

    init = (
        state,
        jnp.int32(0),
        key,
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.int32(0),
        jnp.zeros((config.codebook_size,), jnp.bool_),
    )
    state, _, _, ent_sum, val_sum, n_active, codes_used = jax.lax.while_loop(cond, body, init)
    return state, ent_sum, val_sum, n_active, codes_used


def evaluate_games(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    key: Array,
    config: TrainConfig,
    num_games: int | None = None,
    include_per_game: bool = False,
) -> dict[str, Any]:
    """Greedy evaluation with summary stats (``self_play.py:460-521``).

    Plays FULL games (up to ``config.eval_max_moves`` — the reference caps
    eval games at 200 moves like its training games, clipping measurable
    strength; reaching the 2048 tile takes ~950+ moves).
    """
    import numpy as np

    n = num_games or config.eval_games
    key, seed_key = jax.random.split(key)
    run_seed = jax.random.randint(seed_key, (), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    state, ent_sum, val_sum, n_active, codes_used = _evaluate_rollout(
        params, apply_fns, key, run_seed, config, n
    )

    rewards = np.asarray(state.total_reward)
    tiles = np.asarray(ops.max_tile(state.board))
    n_act = max(int(n_active), 1)

    stats: dict[str, Any] = {
        "mean_reward": float(rewards.mean()),
        "std_reward": float(rewards.std()),
        # Standard error of the mean: 2048 scores are high-variance, so curve
        # comparisons need the eval noise quantified (mean ± 1.96·sem ≈ 95% CI).
        "sem_reward": float(rewards.std() / max(np.sqrt(rewards.size), 1.0)),
        "max_reward": float(rewards.max()),
        "min_reward": float(rewards.min()),
        "mean_max_tile": float(tiles.mean()),
        "max_tile": int(tiles.max()),
        "mean_length": float(np.asarray(state.step_count).mean()),
        # VQ-VAE health: 1 = code collapse (the stochastic model has
        # degenerated to deterministic — functionally the reference's
        # placeholder behavior); healthy runs use a spread of the codes.
        "encoder_codes_used": int(np.asarray(codes_used).sum()),
        # Root visit entropy (ln 4 ≈ 1.386 = undecided) and backed-up values.
        "mean_search_entropy": float(ent_sum) / n_act,
        "mean_search_value": float(val_sum) / n_act,
    }
    for tile in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
        stats[f"reached_{tile}"] = int((tiles >= tile).sum())
    if include_per_game:
        # Raw per-game arrays for tools that need distributions (eval CLI's
        # tile histogram); OFF by default so trainer metric rows stay scalar.
        stats["per_game_rewards"] = rewards.tolist()
        stats["per_game_tiles"] = tiles.tolist()
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


def collection_priorities(
    rewards: Array, values: Array, lengths: Array, config: TrainConfig, terminated: Array
) -> Array:
    """Paper App. C per-position priorities at collection time.

    p_t = |h(ν_t) − h(z_t)| between the stored search value and the TD(λ)
    return, in h-SCALED space — matching the learner's refresh rule
    (|v̂₀ − h(z₀)|, ``learner.train_step``). Scale consistency is
    load-bearing: raw-space collection priorities are ~100× the scaled-space
    refreshed ones, which would skew sampling so hard toward the newest
    segments that the rest of the buffer goes unused. (The reference's
    variance heuristic lives in ``replay.trajectory_priority`` for parity.)
    """
    from simulate_2048_tpu.training.losses import scale_value

    returns = compute_n_step_returns(rewards, values, lengths, config, terminated)
    return jnp.abs(
        scale_value(values, config.value_epsilon)
        - scale_value(returns, config.value_epsilon)
    )


@partial(jax.jit, static_argnums=(3,))
def compute_n_step_returns(
    rewards: Array,
    values: Array,
    lengths: Array,
    config: TrainConfig,
    terminated: Array | None = None,
    tail_value: Array | None = None,
) -> Array:
    """TD(λ) n-step value targets over a trajectory batch.

    z_t = Σ_{i<n} γ^i r_{t+i} + γ^n [(1-λ)·v + λ·(bootstrap chain)] — the
    reference defines this but never calls it (``self_play.py:524-579``);
    here it is a working, tested alternative to raw search-value targets.

    Implemented as a backward scan of the TD(λ) recursion
    G_t = r_t + γ[(1-λ) v_{t+1} + λ G_{t+1}], truncated at episode end.
    ``terminated`` (per episode) selects the boundary treatment: True ⇒ the
    game ended, so the last step's target is r_last (terminal value 0);
    False ⇒ the SEGMENT ended mid-game, so the target AT the last stored
    position is its own search value ν_last (the whole unobserved tail is the
    bootstrap) and the recursion proceeds backward from there. Overwriting
    the boundary target — rather than injecting ν into only the (1-λ) branch
    while the λ branch carries 0 — matters: the latter (this function's
    round-1/round-2-v2 behavior) silently dropped a λ·γ·ν term at EVERY
    segment boundary, shaving ~λ of the bootstrap mass each time a game
    crossed a segment — a bias that compounds across segment chains exactly
    when the agent starts playing games longer than one segment
    (docs/project.md round-2 soak analysis).

    ``tail_value`` (B,), when given, is a value estimate of the board AFTER
    the last stored position (the segment's closing board, which the tape
    stores but collection-time search never evaluates). The truncated
    boundary target then becomes r_last + γ·tail_value — one more real reward
    grounded than the ν_last convention. Reanalyze passes use this: the
    current network can evaluate the closing board where the collection-time
    recursion could not (``training/reanalyze.py``).
    """
    gamma, lam = config.discount, config.td_lambda
    t_max = rewards.shape[-1]
    steps = jnp.arange(t_max)
    in_ep = steps[None, :] < lengths[:, None]  # (B, T)

    term = (
        terminated if terminated is not None else jnp.ones_like(lengths, dtype=bool)
    )
    last = jnp.maximum(lengths - 1, 0)
    last_value = jnp.take_along_axis(values, last[:, None], axis=-1)[:, 0]
    if tail_value is not None:
        last_reward = jnp.take_along_axis(rewards, last[:, None], axis=-1)[:, 0]
        last_value = last_reward + gamma * tail_value
    is_last = steps[None, :] + 1 == lengths[:, None]
    # Positions whose target is forced to ν_last (truncated-segment boundary).
    force = is_last & ~term[:, None]

    v_next = jnp.concatenate([values[:, 1:], jnp.zeros_like(values[:, :1])], axis=-1)
    v_next = jnp.where(steps[None, :] + 1 < lengths[:, None], v_next, 0.0)

    def backward(carry, xs):
        g_next = carry
        r, vn, mask, f = xs
        g = r + gamma * ((1 - lam) * vn + lam * g_next)
        g = jnp.where(f, last_value, g)
        g = jnp.where(mask, g, 0.0)
        return g, g

    xs = (
        jnp.moveaxis(rewards, 1, 0)[::-1],
        jnp.moveaxis(v_next, 1, 0)[::-1],
        jnp.moveaxis(in_ep, 1, 0)[::-1],
        jnp.moveaxis(force, 1, 0)[::-1],
    )
    _, gs = jax.lax.scan(backward, jnp.zeros(rewards.shape[0]), xs)
    return jnp.moveaxis(gs[::-1], 0, 1)
