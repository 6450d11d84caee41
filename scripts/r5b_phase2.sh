#!/bin/bash
# Session-5b phase 2: after the main queue (scalar60k -> cat60k -> decision
# eval -> kernel measurements) releases the chip, run in priority order
# (VERDICT r4 #4b above #9):
#   0. bench.py once (validates the provenance-carrying bench pipeline in
#      this environment before the driver's end-of-round run),
#   1. the early-anneal 60k arm (temperature 0.5/0.1 at 20k/40k),
#   2. the gumbel resumed A/B (3 x 6k off the cat60k checkpoint).
# Usage: r5b_phase2.sh <main_queue_pid>
cd "$(dirname "$0")/.." || exit 1
PID="$1"
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "$(date +%T) phase 2: bench" >> runs/r5b_queue.log
python bench.py > runs/r5b_bench_probe.json 2> runs/r5b_bench_probe.log
echo "$(date +%T) phase 2: early-anneal arm" >> runs/r5b_queue.log
while true; do
  step=$(ls runs/r5_temp_early/ckpt 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  step=${step:-0}
  if [ "$step" -ge 60000 ]; then break; fi
  bash scripts/run_temp_early_arm.sh $(( 60010 - step )) >> runs/r5_temp_early_launch.log 2>&1
done
echo "$(date +%T) phase 2: gumbel resumed A/B" >> runs/r5b_queue.log
bash scripts/run_gumbel_resumed_ab.sh runs/r5_cat60k/ckpt 6000 > runs/r5_gres_launch.log 2>&1
echo "$(date +%T) phase 2 done" >> runs/r5b_queue.log
