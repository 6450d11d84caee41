"""Training-pipeline benchmark: sample / train-step / end-to-end iteration
timings and steps/s.

Counterpart of the reference's ``scripts/benchmark_training.py:31-312``
(dummy-trajectory fixture, JIT-compile vs steady-state separation), run
against the device-resident pipeline.

Usage: ``python scripts/benchmark_training.py [--mode tiny|small|full] [--steps N]``
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["tiny", "small", "full"], default="small")
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np


    from simulate_2048_tpu.training import (
        Trajectory,
        add_trajectories,
        create_optimizer,
        create_train_state,
        default_config,
        init_buffer,
        sample_batch,
        small_config,
        tiny_config,
        train_step,
    )
    from simulate_2048_tpu.utils.profiling import time_fn

    config = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    print(f"mode={args.mode} devices={jax.devices()}", file=sys.stderr)

    state, network = create_train_state(jax.random.PRNGKey(0), config)
    optimizer = create_optimizer(config)

    # Dummy trajectories (fixture in the spirit of benchmark_training.py:85-99).
    rs = np.random.RandomState(0)
    n_traj, t = max(config.min_buffer_size, 64), config.max_trajectory_length
    traj = Trajectory(
        boards=jnp.asarray(rs.randint(0, 8, (n_traj, t + 1, 16)).astype(np.int8)),
        actions=jnp.asarray(rs.randint(0, 4, (n_traj, t)).astype(np.int8)),
        rewards=jnp.asarray((rs.rand(n_traj, t) * 4).astype(np.float32)),
        policies=jnp.asarray(np.full((n_traj, t, 4), 0.25, np.float32)),
        values=jnp.asarray((rs.rand(n_traj, t) * 10).astype(np.float32)),
        priorities=jnp.asarray((rs.rand(n_traj, t)).astype(np.float32)),
        length=jnp.full((n_traj,), t, jnp.int32),
        terminated=jnp.ones(n_traj, bool),
        total_reward=jnp.asarray((rs.rand(n_traj) * 100).astype(np.float32)),
        max_tile=jnp.full((n_traj,), 256, jnp.int32),
    )
    buffer = add_trajectories(init_buffer(config), traj)

    key = jax.random.PRNGKey(1)
    sample_stats = time_fn(
        lambda: sample_batch(buffer, key, config.batch_size, config)[0].observations
    )

    batch, _, weights = sample_batch(buffer, key, config.batch_size, config)

    # NOTE: train_step donates its input state, so thread it through the reps.
    state_box = [state]

    def one_step():
        new_state, loss, _ = train_step(
            state_box[0], network.apply_fns, batch, weights, config, optimizer
        )
        state_box[0] = new_state
        return loss.total_loss

    train_stats = time_fn(one_step, warmup=1, reps=max(args.steps, 3))

    steps_per_s = 1000.0 / train_stats["best_ms"]
    result = {
        "mode": args.mode,
        "batch_size": config.batch_size,
        "sample_ms": sample_stats["best_ms"],
        "train_step_ms": train_stats["best_ms"],
        "train_compile_ms": train_stats["compile_plus_first_ms"],
        "learner_steps_per_s": steps_per_s,
        "samples_per_s": steps_per_s * config.batch_size,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
