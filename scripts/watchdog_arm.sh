#!/bin/bash
# Generic arm babysitter (the champion_r5_watchdog.sh pattern, any arm):
# wait on a training PID; on premature exit (tunnel wedge kills — r4/r5
# run ops), resume via the arm's launch script with the remaining steps
# (--steps is additive on resume, trainer.py train()).
# Usage: watchdog_arm.sh <pid> <ckpt_dir> <target_step> <launch_script> <log>
cd "$(dirname "$0")/.." || exit 1
PID="$1"; CKPT="$2"; TARGET="$3"; SCRIPT="$4"; LOG="$5"
while true; do
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
  step=$(ls "$CKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  step=${step:-0}
  echo "$(date +%T) $SCRIPT pid $PID exited at checkpoint step $step" >> runs/watchdog_arm.log
  if [ "$step" -ge "$TARGET" ]; then break; fi
  remaining=$(( TARGET + 10 - step ))
  echo "$(date +%T) resuming $SCRIPT for $remaining more steps" >> runs/watchdog_arm.log
  bash "$SCRIPT" "$remaining" >> "$LOG" 2>&1 &
  PID=$!
done
