"""Multi-device scaling-efficiency benchmark (BASELINE north star: ≥80% on
N≥2 hosts).

Measures the sharded rollout and DP train step at mesh sizes 1..N and reports
efficiency = throughput(N) / (N · throughput(1)). On a machine with one chip
this runs on a virtual CPU mesh (`--virtual N`) to validate the sharding
story end-to-end; on a pod slice it measures the real thing.

Usage:
  JAX_PLATFORMS=cpu python scripts/benchmark_scaling.py --virtual 8
  python scripts/benchmark_scaling.py            # real attached devices
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0, help="force N virtual CPU devices")
    parser.add_argument("--envs-per-device", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--batch-per-device", type=int, default=64)
    args = parser.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dataclasses import replace

    from simulate_2048_tpu.parallel import make_dp_train_step, make_mesh, make_sharded_rollout, shard_pytree_batch
    from simulate_2048_tpu.training import (
        create_optimizer,
        create_train_state,
        sample_batch,
        tiny_config,
    )
    from simulate_2048_tpu.training.replay import add_trajectories, init_buffer
    from simulate_2048_tpu.utils.profiling import time_fn
    from tests.test_training import make_trajectories  # dummy-trajectory fixture

    devices = jax.devices()
    print(f"devices: {len(devices)} × {devices[0].platform}", file=sys.stderr)

    results = []
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in sizes:
        mesh = make_mesh(devices[:n])

        # Actor scaling: envs proportional to devices, zero communication.
        rollout = make_sharded_rollout(mesh, num_envs=args.envs_per_device * n, num_steps=args.steps)
        st = time_fn(lambda: rollout(jnp.uint32(3)), warmup=1, reps=3)
        env_steps_s = args.envs_per_device * n * args.steps / (st["best_ms"] / 1e3)

        # Learner scaling: global batch proportional to devices.
        cfg = replace(
            tiny_config(),
            hidden_size=64,
            num_residual_blocks=2,
            batch_size=args.batch_per_device * n,
            replay_buffer_size=256,
        )
        state, network = create_train_state(jax.random.PRNGKey(0), cfg)
        optimizer = create_optimizer(cfg)
        buffer = add_trajectories(init_buffer(cfg), make_trajectories(64, 30, cfg))
        batch, _, weights = sample_batch(buffer, jax.random.PRNGKey(1), cfg.batch_size, cfg)
        with mesh:
            batch = shard_pytree_batch(batch, mesh)
            weights = shard_pytree_batch(weights, mesh)
            dp_step = make_dp_train_step(network.apply_fns, cfg, optimizer, mesh)

            def step_once():
                _, loss, _ = dp_step(state, batch, weights)
                return loss.total_loss

            st2 = time_fn(step_once, warmup=1, reps=3)
        samples_s = cfg.batch_size / (st2["best_ms"] / 1e3)

        results.append({"devices": n, "env_steps_per_s": env_steps_s, "learner_samples_per_s": samples_s})
        print(f"N={n}: rollout {env_steps_s/1e6:.2f}M steps/s, learner {samples_s:.0f} samples/s", file=sys.stderr)

    base = results[0]
    for r in results:
        n = r["devices"]
        r["rollout_efficiency"] = r["env_steps_per_s"] / (n * base["env_steps_per_s"])
        r["learner_efficiency"] = r["learner_samples_per_s"] / (n * base["learner_samples_per_s"])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
