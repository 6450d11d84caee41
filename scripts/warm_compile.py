"""AOT-warm the remote compile cache for queued round-5 experiments.

The small-config self-play program (200-step scan x 50-sim search) takes
25-30 minutes to compile cold; compiles are REMOTE (the chip keeps
training undisturbed) and land in the persistent cache, so lowering +
compiling the queued configs NOW — while the champion occupies the chip —
makes each later launch start in seconds instead of half an hour.
``jit.lower(...).compile()`` traces on the host and compiles on the
service: zero device execution beyond tiny param/env init.

Usage: ``python scripts/warm_compile.py [scalar60k gumbel gumbel03 full]``
(default: all, in queue order).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

respect_env_platforms()
enable_compile_cache()

import jax
import jax.numpy as jnp

from simulate_2048_tpu.env import env as envlib
from simulate_2048_tpu.training.config import apply_overrides, default_config, small_config
from simulate_2048_tpu.training.learner import create_train_state
from simulate_2048_tpu.training.self_play import _evaluate_rollout, play_segment

CHAMPION = [
    "value_target_mode=td_lambda", "td_lambda=1.0", "cross_segment_backfill=True",
    "afterstate_value_loss_weight=0.25", "value_bins=256", "reward_bins=128",
    "lr_decay_steps=300000", "eval_interval=5000", "checkpoint_interval=10000",
    "deep_eval_interval=25000", "deep_eval_games=128",
    "eval_prior_temperature=4.0", "eval_pb_c_init=0.5",
    "reanalyze_interval=500", "reanalyze_episodes=64", "reanalyze_mode=search",
]

ARMS = {
    # scripts/run_scalar60k_arm.sh
    "scalar60k": (small_config, [
        "value_target_mode=td_lambda", "td_lambda=1.0", "cross_segment_backfill=True",
        "afterstate_value_loss_weight=0.25", "lr_decay_steps=60000",
        "eval_interval=5000", "checkpoint_interval=10000",
        "deep_eval_interval=30000", "deep_eval_games=128",
        "eval_prior_temperature=4.0", "eval_pb_c_init=0.5",
    ]),
    # scripts/run_cat60k_twin.sh — champion_r3's recipe rebuilt (its ckpt
    # predates this round's environment and was cleaned with the ignored
    # files), so the scalar-vs-categorical decision eval has a live
    # categorical side on the SAME seed/game set.
    "cat60k": (small_config, [
        "value_target_mode=td_lambda", "td_lambda=1.0", "cross_segment_backfill=True",
        "afterstate_value_loss_weight=0.25", "value_bins=256", "reward_bins=128",
        "lr_decay_steps=60000", "eval_interval=5000", "checkpoint_interval=10000",
        "deep_eval_interval=30000", "deep_eval_games=128",
        "eval_prior_temperature=4.0", "eval_pb_c_init=0.5",
    ]),
    # scripts/run_gumbel_resumed_ab.sh (eval/deep-eval intervals differ from
    # the champion but those are host-side; the traced programs match)
    "gumbel": (small_config, CHAMPION + ["root_selection=gumbel"]),
    "gumbel03": (small_config, CHAMPION + ["root_selection=gumbel", "gumbel_c_scale=0.03"]),
    # scripts/run_full_capacity_probe.sh
    "full": (default_config, CHAMPION + ["search_weight_dtype=bfloat16"]),
}


def warm(name: str) -> None:
    preset, overrides = ARMS[name]
    cfg = apply_overrides(preset(), overrides)
    state, net = create_train_state(jax.random.PRNGKey(0), cfg)
    env_state = envlib.reset_batch(jnp.uint32(1), cfg.num_parallel_games)
    key = jax.random.PRNGKey(2)

    t0 = time.time()
    play_segment.lower(
        state.params, net.apply_fns, env_state, key, jnp.float32(1.0),
        cfg, cfg.num_parallel_games, False,
    ).compile()
    print(f"[{name}] play_segment compiled in {time.time() - t0:.0f}s", flush=True)

    for n in sorted({cfg.eval_games, cfg.deep_eval_games or cfg.eval_games}):
        t0 = time.time()
        _evaluate_rollout.lower(
            state.params, net.apply_fns, key, jnp.uint32(3), cfg, n
        ).compile()
        print(f"[{name}] eval rollout n={n} compiled in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(ARMS)
    for nm in names:
        warm(nm)
