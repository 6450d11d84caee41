#!/bin/bash
# VERDICT r4 next #4(b), scaled to the horizon a single session can run:
# does annealing collection temperature EARLY buy strength per chip-hour?
# The champion's unlock came from the paper schedule's T=0.1/T=0 phases
# (200k/300k); if near-greedy collection is safe much earlier, most of a
# run's chip-time currently trains on noise-limited T=1.0 data.
#
# This arm is the categorical 60k twin (scripts/run_cat60k_twin.sh,
# champion_r3's recipe, seed 42) with ONE change: temperature drops
# 1.0 -> 0.5 at 20k and -> 0.1 at 40k (the paper's phases compressed 5x to
# the 60k horizon). Its seed-matched deep evals at 30k/60k (same fixed
# 128-game set as both twins) read directly against runs/r5_cat60k's.
cd "$(dirname "$0")/.." || exit 1
mkdir -p runs/r5_temp_early
exec python -m simulate_2048_tpu.train --mode small --steps "${1:-60000}" \
  --checkpoint-dir runs/r5_temp_early/ckpt --log-dir runs/r5_temp_early \
  --set value_target_mode=td_lambda --set td_lambda=1.0 \
  --set cross_segment_backfill=True \
  --set afterstate_value_loss_weight=0.25 \
  --set value_bins=256 --set reward_bins=128 \
  --set lr_decay_steps=60000 \
  --set "temperature_schedule=[[0,1.0],[20000,0.5],[40000,0.1]]" \
  --set eval_interval=5000 --set checkpoint_interval=10000 \
  --set deep_eval_interval=30000 --set deep_eval_games=128 \
  --set eval_prior_temperature=4.0 --set eval_pb_c_init=0.5
