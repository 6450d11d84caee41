"""Prior-influence sweep: is the sharpened policy prior throttling search?

Round-2 arms plateau at eval ~2400 while the transient peaks (3200-3600) all
belonged to nets with SOFT, barely-trained priors. The checkpoint autopsy
showed a fully FLAT prior hurts — but between "flat" and "as trained" lies a
temperature knob, and PUCT's pb_c_init trades prior influence against Q.
This sweep re-evaluates one checkpoint across (prior temperature, pb_c_init,
sims) without any training.

Usage:
    python scripts/prior_sweep.py --ckpt-dir runs/champion_r2/ckpt [--games 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

respect_env_platforms()
enable_compile_cache()

import jax
import jax.numpy as jnp

from simulate_2048_tpu.training.checkpoint import CheckpointManager
from simulate_2048_tpu.training.config import small_config
from simulate_2048_tpu.training.learner import create_train_state
from simulate_2048_tpu.training.self_play import evaluate_games


def soften_prior(apply_fns, temp: float):
    real = apply_fns.prediction

    def prediction(params, hidden):
        logits, value = real(params, hidden)
        return logits / temp, value

    return apply_fns._replace(prediction=prediction)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt-dir", default="runs/champion_r2/ckpt")
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--games", type=int, default=16)
    parser.add_argument("--seed", type=int, default=77)
    parser.add_argument(
        "--variants", default=None, help="comma-separated subset of grid names"
    )
    parser.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="FIELD=VALUE",
        help="TrainConfig overrides matching the checkpoint's training config "
        "(e.g. --set observation_onehot=True for nets trained on lifted obs)",
    )
    args = parser.parse_args()

    cfg = small_config()
    if args.overrides:
        import ast

        fields = {}
        for item in args.overrides:
            k, _, raw = item.partition("=")
            try:
                fields[k] = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                fields[k] = raw
        cfg = dataclasses.replace(cfg, **fields)
    key = jax.random.PRNGKey(args.seed)
    state, network = create_train_state(jax.random.PRNGKey(0), cfg)
    restored = CheckpointManager(args.ckpt_dir).restore(state, step=args.step)
    params = restored.params

    grid = [
        ("base", 1.0, cfg.pb_c_init, cfg.num_simulations),
        ("prior_T2", 2.0, cfg.pb_c_init, cfg.num_simulations),
        ("prior_T4", 4.0, cfg.pb_c_init, cfg.num_simulations),
        ("pb_c_0.5", 1.0, 0.5, cfg.num_simulations),
        ("pb_c_0.8", 1.0, 0.8, cfg.num_simulations),
        ("pb_c_1.75", 1.0, 1.75, cfg.num_simulations),
        ("pb_c_2.5", 1.0, 2.5, cfg.num_simulations),
        ("pb_c_4.0", 1.0, 4.0, cfg.num_simulations),
        ("T4_pb_c_2.5", 4.0, 2.5, cfg.num_simulations),
        ("T4_pb_c_0.5", 4.0, 0.5, cfg.num_simulations),
    ]
    if args.variants:
        wanted = set(args.variants.split(","))
        grid = [g for g in grid if g[0] in wanted]
    for name, t, pb, sims in grid:
        c = dataclasses.replace(cfg, pb_c_init=pb, num_simulations=sims)
        fns = soften_prior(network.apply_fns, t) if t != 1.0 else network.apply_fns
        stats = evaluate_games(params, fns, key, c, args.games)
        print(
            json.dumps(
                {
                    "variant": name,
                    "mean_reward": round(stats["mean_reward"], 1),
                    "sem": round(stats["sem_reward"], 1),
                    "max_tile": stats["max_tile"],
                    "reached_512": stats["reached_512"],
                    "search_entropy": round(stats["mean_search_entropy"], 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
