#!/bin/bash
# Round-5 chip scheduler: babysit the champion_r5 run to its 600k target
# (resuming on premature exit — round 4's tunnel wedges killed the champion
# three times), then hand the chip to the next queued experiment
# (scalar-vs-categorical 60k, VERDICT r4 next #3) with zero idle time.
# Usage: champion_r5_watchdog.sh <champion_pid> [target_step]
cd "$(dirname "$0")/.." || exit 1
PID="$1"
TARGET="${2:-600000}"
while true; do
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
  step=$(ls runs/champion_r5/ckpt 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  step=${step:-0}
  echo "$(date +%T) champion process $PID exited at checkpoint step $step" >> runs/champion_r5_watchdog.log
  if [ "$step" -ge "$TARGET" ]; then break; fi
  remaining=$(( TARGET + 10 - step ))
  echo "$(date +%T) resuming for $remaining more steps" >> runs/champion_r5_watchdog.log
  bash scripts/run_champion_r5.sh "$remaining" >> runs/champion_r5_launch.log 2>&1 &
  PID=$!
done
echo "$(date +%T) champion done; starting scalar60k arm" >> runs/champion_r5_watchdog.log
bash scripts/run_scalar60k_arm.sh > runs/r4_scalar60k_launch.log 2>&1
echo "$(date +%T) scalar60k arm finished" >> runs/champion_r5_watchdog.log
