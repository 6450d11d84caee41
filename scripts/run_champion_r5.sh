#!/bin/bash
# Round-5 champion: finish the anneal (VERDICT r4 missing #1 / next #1).
# Resumes the round-4 champion from its 274k checkpoint and trains through
# the schedule's fully-greedy phase (T=0 from 300k, paper App. C /
# reference config.py:41-46) to ~600k steps. The r4 curve nearly tripled
# (3431 -> 9010) inside the T=0.1 phase alone and was still climbing when
# the round ended 26k steps short of greedy.
#
# Identical recipe/config to scripts/run_champion_r4.sh (sidecar-equal, so
# the provenance guard stays silent): cosine LR over 300k (floor 3e-5
# beyond), rotating 10k-segment buffer, search-mode reanalyze every 500
# steps, PUCT@50 collection, n=128 deep evals every 25k. Deep evals are now
# SEED-MATCHED across checkpoints (VERDICT r4 weak #3), so champion
# selection into ckpt/best compares policies, not game draws.
#
# The run continues IN A COPY (runs/champion_r5) so runs/champion_r4 stays
# the frozen round-4 artifact. checkpoint_buffer=False: each resume refills
# the buffer from self-play at the current temperature (the r4-proven
# procedure; runtime payload carries backfill/reanalyze continuity).
cd "$(dirname "$0")/.." || exit 1
mkdir -p runs/champion_r5
if [ ! -d runs/champion_r5/ckpt ]; then
  cp -r runs/champion_r4/ckpt runs/champion_r5/ckpt
  # The in-run best is re-established under the new seed-matched protocol.
  rm -rf runs/champion_r5/ckpt/best runs/champion_r5/ckpt/deep_eval_best.json
fi
exec python -m simulate_2048_tpu.train --mode small --steps "${1:-326000}" \
  --checkpoint-dir runs/champion_r5/ckpt --log-dir runs/champion_r5 \
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
