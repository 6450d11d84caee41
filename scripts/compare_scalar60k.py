"""Seed-matched scalar-vs-categorical decision eval (VERDICT r4 next #3).

Evaluates the categorical-heads 60k arm (runs/r5_cat60k — champion_r3's
recipe rebuilt; the original ckpt predates this session's environment) and
the scalar-MSE-heads twin (runs/r4_scalar60k, same recipe/seed/horizon,
bins=1) on the SAME 128 full games: identical eval key -> identical spawn
streams (games are policy-independent only in their randomness source; both
agents face the same draw sequence per lane). Greedy calibrated search
(T=4, pb_c 0.5) as in every deep eval.

Usage (attached TPU):
    python scripts/compare_scalar60k.py [--games 128] [ckpt_dir ...]
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

from simulate_2048_tpu.training.checkpoint import CheckpointManager, load_train_config
from simulate_2048_tpu.training.config import apply_overrides, small_config
from simulate_2048_tpu.training.learner import create_train_state
from simulate_2048_tpu.training.self_play import evaluate_games

# champion_r3 predates the config sidecar; its recipe is pinned in
# docs/project.md ("Round-3 champion") and scripts/run_scalar60k_arm.sh is
# its scalar twin.
R3_OVERRIDES = [
    "value_target_mode=td_lambda", "td_lambda=1.0", "cross_segment_backfill=True",
    "afterstate_value_loss_weight=0.25", "value_bins=256", "reward_bins=128",
    "lr_decay_steps=60000", "eval_prior_temperature=4.0", "eval_pb_c_init=0.5",
]


def eval_ckpt(ckpt_dir: str, overrides: list[str] | None, games: int, key) -> dict:
    cfg = load_train_config(ckpt_dir)
    if cfg is None:
        cfg = apply_overrides(small_config(), overrides)
    state, net = create_train_state(jax.random.PRNGKey(0), cfg)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    assert state is not None, f"no checkpoint in {ckpt_dir}"
    stats = evaluate_games(state.params, net.apply_fns, key, cfg, games)
    return {"ckpt": ckpt_dir, "step": int(state.step), **{k: v for k, v in stats.items()}}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--key", type=int, default=123)
    ap.add_argument(
        "ckpts", nargs="*",
        default=["runs/r5_cat60k/ckpt", "runs/r4_scalar60k/ckpt"],
        help="checkpoint dirs to evaluate on the shared game set "
        "(config from each dir's sidecar; R3_OVERRIDES fallback)",
    )
    args = ap.parse_args()
    key = jax.random.PRNGKey(args.key)
    for ckpt in args.ckpts:
        out = eval_ckpt(ckpt, R3_OVERRIDES, args.games, key)
        print(json.dumps({k: v for k, v in out.items() if not isinstance(v, list)}))


if __name__ == "__main__":
    main()
