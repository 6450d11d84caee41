#!/bin/bash
# VERDICT r3 #10: long-horizon scalar-vs-categorical isolation. Seed-matched
# 60k-step twin of runs/champion_r3 (which decided only the COMBINED recipe)
# with scalar MSE heads instead of categorical two-hot — deep-eval endpoints
# decide whether the categorical heads are load-bearing.
cd "$(dirname "$0")/.." || exit 1
mkdir -p runs/r4_scalar60k
exec python -m simulate_2048_tpu.train --mode small --steps "${1:-60000}" \
  --checkpoint-dir runs/r4_scalar60k/ckpt --log-dir runs/r4_scalar60k \
  --set value_target_mode=td_lambda --set td_lambda=1.0 \
  --set cross_segment_backfill=True \
  --set afterstate_value_loss_weight=0.25 \
  --set lr_decay_steps=60000 \
  --set eval_interval=5000 --set checkpoint_interval=10000 \
  --set deep_eval_interval=30000 --set deep_eval_games=128 \
  --set eval_prior_temperature=4.0 --set eval_pb_c_init=0.5
