#!/bin/bash
# VERDICT r4 next #5: capacity probe at the new frontier. The breakthrough
# agent is the SMALL preset (128x5, 50 sims); E11 cleared hidden-256 only at
# a 6k horizon, pre-breakthrough. With the categorical Pallas kernel landed
# (round 5), train the paper-full preset (256x10, 100 sims, bf16 compute)
# on the annealed champion recipe; compare deep-eval-vs-WALL-CLOCK against
# runs/champion_r5 (per-step comparisons hide the full preset's ~3-4x
# higher step cost). Pass steps as $1 (default 100000).
cd "$(dirname "$0")/.." || exit 1
mkdir -p runs/r5_full_probe
exec python -m simulate_2048_tpu.train --mode full --steps "${1:-100000}" \
  --checkpoint-dir runs/r5_full_probe/ckpt --log-dir runs/r5_full_probe \
  --set value_target_mode=td_lambda --set td_lambda=1.0 \
  --set cross_segment_backfill=True \
  --set afterstate_value_loss_weight=0.25 \
  --set value_bins=256 --set reward_bins=128 \
  --set search_weight_dtype=bfloat16 \
  --set lr_decay_steps=300000 \
  --set eval_interval=5000 --set checkpoint_interval=10000 \
  --set deep_eval_interval=25000 --set deep_eval_games=128 \
  --set eval_prior_temperature=4.0 --set eval_pb_c_init=0.5 \
  --set reanalyze_interval=500 --set reanalyze_episodes=64 \
  --set reanalyze_mode=search
