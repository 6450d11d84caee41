#!/bin/bash
# Categorical side of the scalar-vs-categorical decision (VERDICT r4 next
# #3). This is champion_r3's exact recipe (docs/project.md "Round-3
# champion"; R3_OVERRIDES in scripts/compare_scalar60k.py) re-run from
# scratch: the original runs/champion_r3/ckpt predates this session's
# environment and was cleaned with the ignored files, so the seed-matched
# decision eval needs a live categorical checkpoint. Identical seed (config
# default 42), horizon, and eval protocol as scripts/run_scalar60k_arm.sh —
# the two arms differ ONLY in value_bins/reward_bins (256/128 vs scalar
# MSE), and their in-run deep evals (key = config seed + fixed salt) play
# the SAME 128-game set.
cd "$(dirname "$0")/.." || exit 1
mkdir -p runs/r5_cat60k
exec python -m simulate_2048_tpu.train --mode small --steps "${1:-60000}" \
  --checkpoint-dir runs/r5_cat60k/ckpt --log-dir runs/r5_cat60k \
  --set value_target_mode=td_lambda --set td_lambda=1.0 \
  --set cross_segment_backfill=True \
  --set afterstate_value_loss_weight=0.25 \
  --set value_bins=256 --set reward_bins=128 \
  --set lr_decay_steps=60000 \
  --set eval_interval=5000 --set checkpoint_interval=10000 \
  --set deep_eval_interval=30000 --set deep_eval_games=128 \
  --set eval_prior_temperature=4.0 --set eval_pb_c_init=0.5
