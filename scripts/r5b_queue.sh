#!/bin/bash
# Session-5b chip queue: run each arm TO ITS TARGET STEP (relaunching on
# tunnel-wedge kills — the launch scripts' --steps is additive on resume),
# then the decision eval and the categorical kernel measurements, serially
# with zero chip idle.
# Usage: r5b_queue.sh [first_arm_target]
cd "$(dirname "$0")/.." || exit 1

run_to_target() { # <launch_script> <ckpt_dir> <target_step> <log>
  local script="$1" ckpt="$2" target="$3" log="$4" step remaining
  while true; do
    step=$(ls "$ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    step=${step:-0}
    if [ "$step" -ge "$target" ]; then break; fi
    remaining=$(( target + 10 - step ))
    echo "$(date +%T) $script -> $remaining more steps (at $step/$target)" >> runs/r5b_queue.log
    bash "$script" "$remaining" >> "$log" 2>&1
  done
  echo "$(date +%T) $script reached $target" >> runs/r5b_queue.log
}

run_to_target scripts/run_scalar60k_arm.sh runs/r4_scalar60k/ckpt "${1:-60000}" runs/r4_scalar60k_launch.log
run_to_target scripts/run_cat60k_twin.sh runs/r5_cat60k/ckpt 60000 runs/r5_cat60k_launch.log
echo "$(date +%T) decision eval" >> runs/r5b_queue.log
python scripts/compare_scalar60k.py > runs/r5_scalar_vs_cat_eval.log 2>&1
echo "$(date +%T) decision eval done; kernel measurements" >> runs/r5b_queue.log
bash scripts/measure_categorical_kernel.sh > runs/r5_cat_kernel_measurements.log 2>&1
echo "$(date +%T) kernel measurements done" >> runs/r5b_queue.log
