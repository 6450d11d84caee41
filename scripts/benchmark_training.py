"""Training-pipeline benchmark: sample / train-step timings, steps/s, and a
fp32-vs-bf16 comparison with a model-FLOPs-utilization (MFU) estimate.

Counterpart of the reference's ``scripts/benchmark_training.py:31-312``
(dummy-trajectory fixture, JIT-compile vs steady-state separation), run
against the device-resident pipeline. FLOPs come from XLA's own cost model
(``compiled.cost_analysis()``); MFU is reported against the chip's bf16 MXU
peak for BOTH dtypes (fp32 matmuls are not MXU-native on TPU, which is
exactly the point of the comparison).

Usage: ``python scripts/benchmark_training.py [--mode tiny|small|full]
[--steps N] [--dtype both|fp32|bf16] [--peak-tflops 197]``
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
    parser.add_argument("--dtype", choices=["both", "fp32", "bf16", "config"], default="both")
    parser.add_argument(
        "--peak-tflops", type=float, default=197.0,
        help="bf16 MXU peak of the attached chip in TFLOP/s (v5e=197, v5p=459)",
    )
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

    from dataclasses import replace

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

    def step_flops(cfg, apply_fns):
        """XLA's own FLOP count for the full jitted train step (None if the
        backend does not expose a cost model)."""
        try:
            from simulate_2048_tpu.training.learner import train_step as _ts

            lowered = jax.jit(
                lambda s, b, w: _ts(s, apply_fns, b, w, cfg, optimizer)
            ).lower(state, batch, weights)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) or None
        except Exception as exc:  # noqa: BLE001 — backend-dependent API
            print(f"cost_analysis unavailable: {exc}", file=sys.stderr)
            return None

    def bench_dtype(use_bf16: bool) -> dict:
        cfg = replace(config, use_bfloat16=use_bf16)
        st, net = create_train_state(jax.random.PRNGKey(0), cfg)
        box = [st]

        def one_step():
            new_state, loss, _ = train_step(
                box[0], net.apply_fns, batch, weights, cfg, optimizer
            )
            box[0] = new_state
            return loss.total_loss

        stats = time_fn(one_step, warmup=1, reps=max(args.steps, 3))
        steps_per_s = 1000.0 / stats["best_ms"]
        flops = step_flops(cfg, net.apply_fns)
        out = {
            "train_step_ms": stats["best_ms"],
            "train_compile_ms": stats["compile_plus_first_ms"],
            "learner_steps_per_s": steps_per_s,
            "samples_per_s": steps_per_s * cfg.batch_size,
        }
        if flops:
            out["flops_per_step"] = flops
            # MFU vs the chip's bf16 MXU peak (fair for both dtypes: fp32
            # matmuls don't ride the MXU natively, which this ratio exposes).
            out["mfu_vs_bf16_peak"] = (
                flops / (stats["best_ms"] / 1e3) / (args.peak_tflops * 1e12)
            )
        return out

    result = {
        "mode": args.mode,
        "batch_size": config.batch_size,
        "sample_ms": sample_stats["best_ms"],
        "peak_tflops_assumed": args.peak_tflops,
    }
    if args.dtype in ("fp32", "both"):
        result["fp32"] = bench_dtype(False)
    if args.dtype in ("bf16", "both"):
        result["bf16"] = bench_dtype(True)
    if args.dtype == "config":
        result["config_dtype"] = bench_dtype(config.use_bfloat16)
    if "fp32" in result and "bf16" in result:
        result["bf16_speedup"] = (
            result["fp32"]["train_step_ms"] / result["bf16"]["train_step_ms"]
        )
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
