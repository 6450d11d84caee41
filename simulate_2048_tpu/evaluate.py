"""Evaluation CLI: ``python -m simulate_2048_tpu.evaluate --games 10``.

Counterpart of ``reinforce/evaluate.py:27-183`` with its stub fixed: the
reference warns and evaluates a FRESH network when given a checkpoint
(``evaluate.py:75-78``); here ``--checkpoint-dir`` actually loads weights AND
the exact config the checkpoint was trained with (``train_config.json``
sidecar — the reference saves config in its payload, ``learner.py:382-388``,
but its eval never reads it). Games are FULL-LENGTH (streaming while-loop,
``eval_max_moves``) under the calibrated eval search
(``eval_prior_temperature`` / ``eval_pb_c_init``), matching trainer evals.
"""

from __future__ import annotations

import argparse
import collections


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate a Stochastic MuZero agent on 2048")
    parser.add_argument(
        "--mode",
        choices=["tiny", "small", "full"],
        default="small",
        help="config preset; ignored when --checkpoint-dir holds a train_config.json sidecar",
    )
    parser.add_argument("--games", type=int, default=10)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="FIELD=VALUE",
        help="override any TrainConfig field after sidecar/preset resolution "
        "(e.g. --set eval_prior_temperature=4.0); repeatable",
    )
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax

    from simulate_2048_tpu.training import (
        CheckpointManager,
        create_train_state,
        default_config,
        small_config,
        tiny_config,
    )
    from simulate_2048_tpu.training.checkpoint import load_train_config
    from simulate_2048_tpu.training.self_play import evaluate_games

    config = None
    if args.checkpoint_dir:
        config = load_train_config(args.checkpoint_dir)
        if config is not None:
            print(f"config: {args.checkpoint_dir}/train_config.json")
    if config is None:
        config = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    if args.overrides:
        from simulate_2048_tpu.training.config import apply_overrides

        try:
            config = apply_overrides(config, args.overrides)
        except ValueError as e:
            parser.error(str(e))
        print(f"config overrides: {args.overrides}")

    state, network = create_train_state(jax.random.PRNGKey(args.seed), config)

    if args.checkpoint_dir:
        mgr = CheckpointManager(args.checkpoint_dir)
        if args.step is not None:
            available = mgr.all_steps()
            if args.step not in available:
                parser.error(
                    f"step {args.step} has no checkpoint in {args.checkpoint_dir}; "
                    f"available steps: {sorted(available) or 'none'}"
                )
        restored = mgr.restore(state, step=args.step)
        if restored is None:
            print(f"warning: no checkpoint found in {args.checkpoint_dir}; using fresh weights")
        else:
            state = restored
            print(f"loaded checkpoint at step {int(state.step)}")

    stats = evaluate_games(
        state.params,
        network.apply_fns,
        jax.random.PRNGKey(args.seed + 1),
        config,
        num_games=args.games,
        include_per_game=True,
    )

    print(f"games: {args.games}")
    print(
        f"mean reward: {stats['mean_reward']:.1f} ± {stats['std_reward']:.1f}"
        f" (sem {stats['sem_reward']:.1f}, max {stats['max_reward']:.0f})"
    )
    print(f"mean length: {stats['mean_length']:.1f}")
    print(f"mean search value: {stats['mean_search_value']:.1f}")
    histogram = collections.Counter(stats["per_game_tiles"])
    print("max-tile histogram:")
    for tile in sorted(histogram):
        print(f"  {tile}: {histogram[tile]}")
    for tile in (512, 1024, 2048):
        print(f"reached {tile}: {stats[f'reached_{tile}']}/{args.games}")


if __name__ == "__main__":
    main()
