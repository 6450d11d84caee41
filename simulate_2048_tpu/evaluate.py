"""Evaluation CLI: ``python -m simulate_2048_tpu.evaluate --games 10``.

Counterpart of ``reinforce/evaluate.py:27-183`` with its stub fixed: the
reference warns and evaluates a FRESH network when given a checkpoint
(``evaluate.py:75-78``); here ``--checkpoint-dir`` actually loads weights.
"""

from __future__ import annotations

import argparse
import collections


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate a Stochastic MuZero agent on 2048")
    parser.add_argument("--mode", choices=["tiny", "small", "full"], default="small")
    parser.add_argument("--games", type=int, default=10)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax
    import numpy as np

    from simulate_2048_tpu.training import (
        CheckpointManager,
        create_train_state,
        default_config,
        small_config,
        tiny_config,
    )
    from simulate_2048_tpu.training.self_play import play_games

    config = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    state, network = create_train_state(jax.random.PRNGKey(args.seed), config)

    if args.checkpoint_dir:
        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore(state)
        if restored is None:
            print(f"warning: no checkpoint found in {args.checkpoint_dir}; using fresh weights")
        else:
            state = restored
            print(f"loaded checkpoint at step {int(state.step)}")

    import jax.numpy as jnp

    traj = play_games(
        state.params, network.apply_fns, jax.random.PRNGKey(args.seed + 1),
        jnp.float32(0.0), config, args.games, True,
    )

    rewards = np.asarray(traj.total_reward)
    tiles = np.asarray(traj.max_tile)
    print(f"games: {args.games}")
    print(f"mean reward: {rewards.mean():.1f} ± {rewards.std():.1f} (max {rewards.max():.0f})")
    print(f"mean length: {np.asarray(traj.length).mean():.1f}")
    histogram = collections.Counter(tiles.tolist())
    print("max-tile histogram:")
    for tile in sorted(histogram):
        print(f"  {tile}: {histogram[tile]}")


if __name__ == "__main__":
    main()
