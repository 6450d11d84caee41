#!/bin/bash
# Round-4 champion: the round-3 recipe (λ=1 TD + cross-segment backfill +
# afterstate Q loss + categorical heads + calibrated eval search) extended to
# a 300k-step horizon with the experience/steering levers the round-3 verdict
# called for: a ROTATING buffer (10k segments vs ~48k generated => ~4.8
# rotations), search-mode reanalyze every 500 steps (the staleness horizon
# its mechanism story says it pays at), cosine LR over the full run, the
# paper's full temperature anneal (greedy from 300k), and n=128 deep evals
# every 25k steps with best-by-deep-eval champion selection.
# Collection search stays PUCT@50 (paper constants): the round-4 Gumbel
# arms measured below-parity for from-scratch collection (docs/project.md).
cd "$(dirname "$0")/.." || exit 1
mkdir -p runs/champion_r4
exec python -m simulate_2048_tpu.train --mode small --steps 300000 \
  --checkpoint-dir runs/champion_r4/ckpt --log-dir runs/champion_r4 \
  --set value_target_mode=td_lambda --set td_lambda=1.0 \
  --set cross_segment_backfill=True \
  --set afterstate_value_loss_weight=0.25 \
  --set value_bins=256 --set reward_bins=128 \
  --set lr_decay_steps=300000 \
  --set eval_interval=5000 --set checkpoint_interval=10000 \
  --set deep_eval_interval=25000 --set deep_eval_games=128 \
  --set eval_prior_temperature=4.0 --set eval_pb_c_init=0.5 \
  --set reanalyze_interval=500 --set reanalyze_episodes=64 \
  --set reanalyze_mode=search
