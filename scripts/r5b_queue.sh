#!/bin/bash
# Session-5b chip queue: after the scalar60k arm (PID $1) exits, run the
# remaining round-5 program serially with zero chip idle —
#   1. the categorical 60k twin (decision eval's live categorical side),
#   2. the seed-matched decision eval itself (key 123, both checkpoints),
#   3. the categorical Pallas-kernel measurements (VERDICT r4 #2 criterion).
# Gumbel resumed arms / stretch arms are launched interactively after these
# (they depend on how much wall-clock remains).
cd "$(dirname "$0")/.." || exit 1
PID="$1"
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "$(date +%T) scalar60k done; launching cat60k twin" >> runs/r5b_queue.log
bash scripts/run_cat60k_twin.sh > runs/r5_cat60k_launch.log 2>&1
echo "$(date +%T) cat60k done; running decision eval" >> runs/r5b_queue.log
python scripts/compare_scalar60k.py > runs/r5_scalar_vs_cat_eval.log 2>&1
echo "$(date +%T) decision eval done; kernel measurements" >> runs/r5b_queue.log
bash scripts/measure_categorical_kernel.sh > runs/r5_cat_kernel_measurements.log 2>&1
echo "$(date +%T) kernel measurements done" >> runs/r5b_queue.log
