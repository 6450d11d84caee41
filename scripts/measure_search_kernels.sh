#!/bin/bash
# VERDICT r3 #5: TPU timings for the Pallas search kernel at
# (a) the flagship's ACTUAL self-play batch (256 games, full config) — the
#     batch size the auto backend gate must be justified at, and
# (b) hidden>=512 towers at B=1024 — the HBM-streaming path's real domain.
# Each pair prints one JSON line (XLA then Pallas).
cd "$(dirname "$0")/.." || exit 1
# Pallas first (fast Mosaic compiles); the XLA baselines compile slowest.
set -x
python scripts/benchmark_mcts.py --mode full --boards 256 --sims 100 --max-depth 32 --pallas --weight-dtype bfloat16
python scripts/benchmark_mcts.py --mode full --boards 1024 --sims 100 --max-depth 32 --hidden 512 --pallas --weight-dtype bfloat16
python scripts/benchmark_mcts.py --mode full --boards 256 --sims 100 --max-depth 32
python scripts/benchmark_mcts.py --mode full --boards 1024 --sims 100 --max-depth 32 --hidden 512
