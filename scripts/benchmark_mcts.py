"""Batched MCTS benchmark — BASELINE.json config 3: stochastic search with
chance nodes over a batch of boards, untrained networks.

Reports searches/s and simulations/s (one simulation = one tree expansion =
one φψ + gf network evaluation pair, batched across boards).

Usage: ``python scripts/benchmark_mcts.py [--boards 256] [--sims 64] [--mode small]``
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--boards", type=int, default=256)
    parser.add_argument("--sims", type=int, default=64)
    parser.add_argument("--mode", choices=["tiny", "small", "full"], default="small")
    parser.add_argument(
        "--max-depth",
        type=int,
        default=None,
        help="tree-depth cap (None = unbounded; presets use 32 via search_max_depth)",
    )
    parser.add_argument(
        "--hidden",
        type=int,
        default=None,
        help="override the preset's hidden size (e.g. 512 to probe the "
        "HBM-streaming kernel domain)",
    )
    parser.add_argument(
        "--blocks",
        type=int,
        default=None,
        help="override the preset's residual block count",
    )
    parser.add_argument(
        "--pallas",
        action="store_true",
        help="use the whole-search VMEM kernel (ops/pallas_search.py) instead "
        "of the XLA search",
    )
    parser.add_argument(
        "--value-bins",
        type=int,
        default=1,
        help="categorical value/Q head bins (1 = scalar heads; the champion "
        "recipe uses 256 — the kernel takes the expectation in VMEM)",
    )
    parser.add_argument(
        "--reward-bins",
        type=int,
        default=1,
        help="categorical reward head bins (champion recipe: 128)",
    )
    parser.add_argument(
        "--weight-dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help="packed-weight dtype for the Pallas kernel (bf16 halves VMEM and "
        "runs expansion matmuls MXU-native)",
    )
    parser.add_argument(
        "--trace",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler device trace of one search batch into DIR "
        "(the TPU-native analogue of the reference's cProfile harness, "
        "scripts/profile_mcts.py)",
    )
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp


    from simulate_2048_tpu.env import env as envlib
    from simulate_2048_tpu.models import create_network
    from simulate_2048_tpu.search import SearchConfig, batched_run_mcts
    from simulate_2048_tpu.training import default_config, small_config, tiny_config
    from simulate_2048_tpu.utils.profiling import time_fn

    cfg = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    if args.hidden is not None or args.blocks is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            hidden_size=args.hidden or cfg.hidden_size,
            num_residual_blocks=args.blocks or cfg.num_residual_blocks,
        )
    print(f"devices={jax.devices()} boards={args.boards} sims={args.sims} "
          f"hidden={cfg.hidden_size}x{cfg.num_residual_blocks}", file=sys.stderr)

    network = create_network(
        jax.random.PRNGKey(0),
        hidden_size=cfg.hidden_size,
        num_blocks=cfg.num_residual_blocks,
        codebook_size=cfg.codebook_size,
        value_bins=args.value_bins,
        reward_bins=args.reward_bins,
    )
    search_cfg = SearchConfig(
        num_simulations=args.sims,
        codebook_size=cfg.codebook_size,
        discount=cfg.discount,
        max_depth=args.max_depth,
        value_bins=args.value_bins,
        reward_bins=args.reward_bins,
    )

    state = envlib.reset_batch(0, args.boards)
    obs = envlib.get_observation(state)
    keys = jax.random.split(jax.random.PRNGKey(1), args.boards)

    if args.pallas:
        from simulate_2048_tpu.ops.pallas_search import (
            pack_search_params, pallas_search_plan, run_mcts_pallas,
        )

        wdtype = jnp.bfloat16 if args.weight_dtype == "bfloat16" else jnp.float32
        plan = pallas_search_plan(
            search_cfg, cfg.hidden_size, cfg.num_residual_blocks, args.boards, wdtype
        )
        if plan is None:
            print("pallas: config unsupported (no VMEM fit / out of scope)", file=sys.stderr)
            sys.exit(2)
        stream_chunk = plan if plan else None
        print(f"pallas plan: {'resident' if not plan else f'stream chunk={plan}'}",
              file=sys.stderr)
        # k must agree with run_mcts_pallas's kernel sizing, which uses
        # max(num_actions, codebook_size) (self_play.py packs the same way).
        k_width = max(cfg.action_size, cfg.codebook_size)
        packed = jax.jit(
            lambda p: pack_search_params(
                p, cfg.num_residual_blocks, k_width, wdtype, stream_chunk,
                value_bins=args.value_bins, reward_bins=args.reward_bins,
            )
        )(network.params)
        run = jax.jit(
            lambda o, k: run_mcts_pallas(
                network.params, network.apply_fns, o, k, search_cfg,
                num_blocks=cfg.num_residual_blocks, packed=packed,
                stream_chunk=stream_chunk,
            )
        )
    else:
        run = jax.jit(
            lambda o, k: batched_run_mcts(network.params, network.apply_fns, o, k, search_cfg)
        )
    stats = time_fn(lambda: run(obs, keys).action_weights, warmup=1, reps=5)

    if args.trace:
        from simulate_2048_tpu.utils.profiling import trace

        with trace(args.trace):
            jax.block_until_ready(run(obs, keys).action_weights)
        print(f"trace written to {args.trace} (view in TensorBoard / perfetto)", file=sys.stderr)

    searches_per_s = args.boards / (stats["best_ms"] / 1e3)
    result = {
        "boards": args.boards,
        "hidden": cfg.hidden_size,
        "blocks": cfg.num_residual_blocks,
        "num_simulations": args.sims,
        "search_ms_per_batch": stats["best_ms"],
        "compile_ms": stats["compile_plus_first_ms"],
        "searches_per_s": searches_per_s,
        "simulations_per_s": searches_per_s * args.sims,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
