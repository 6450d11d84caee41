#!/bin/bash
# VERDICT r4 next #9: Gumbel root selection in its CLAIMED domain.
# The r4 negative was for from-scratch collection, where the sigma(q_hat)
# term (~6 nats under min-max completion) swamps the prior exactly when the
# value net is least trustworthy. The mechanism story says Q-TRUSTING
# regimes — resumed strong checkpoints — are where sequential halving
# should pay. Three 6k-step arms resumed from the SAME champion checkpoint
# (pass the source ckpt dir as $1, default runs/champion_r5/ckpt):
#   puct      — control (the champion recipe as-is)
#   gumbel    — root_selection=gumbel, default c_scale=0.1
#   gumbel03  — gumbel with the gentler gumbel_c_scale=0.03
# Deep evals are seed-matched (round-5 trainer), so endpoint deltas compare
# policies, not game draws. Evaluation searches always run PUCT
# (search_config_from forces it in eval mode), so curves stay comparable.
# Reanalyze is OFF in all three arms (uniformly, so it is not a confound):
# the gumbel claim is about COLLECTION root selection, and the gumbel-root
# reanalyze-search program has never been compiled into the cache — a
# 25-minute cold compile per arm for a knob orthogonal to the question.
cd "$(dirname "$0")/.." || exit 1
SRC="${1:-runs/r5_cat60k/ckpt}"
STEPS="${2:-6000}"
for arm in puct gumbel gumbel03; do
  dir="runs/r5_gres_${arm}"
  mkdir -p "$dir"
  if [ ! -d "$dir/ckpt" ]; then
    cp -r "$SRC" "$dir/ckpt"
    rm -rf "$dir/ckpt/best" "$dir/ckpt/deep_eval_best.json"
  fi
  extra=()
  case "$arm" in
    gumbel)   extra=(--set root_selection=gumbel) ;;
    gumbel03) extra=(--set root_selection=gumbel --set gumbel_c_scale=0.03) ;;
  esac
  python -m simulate_2048_tpu.train --mode small --steps "$STEPS" \
    --checkpoint-dir "$dir/ckpt" --log-dir "$dir" \
    --set value_target_mode=td_lambda --set td_lambda=1.0 \
    --set cross_segment_backfill=True \
    --set afterstate_value_loss_weight=0.25 \
    --set value_bins=256 --set reward_bins=128 \
    --set lr_decay_steps=60000 \
    --set eval_interval=2000 --set checkpoint_interval=10000 \
    --set deep_eval_interval="$STEPS" --set deep_eval_games=128 \
    --set eval_prior_temperature=4.0 --set eval_pb_c_init=0.5 \
    "${extra[@]}" || exit 1
done
