#!/bin/bash
# VERDICT r4 next #2 (done-criterion): the Pallas search kernel WITH
# categorical heads, measured at its real operating points —
# (a) the champion recipe's exact search shape: small preset (H=128, NB=5,
#     S=50, depth 32) with value_bins=256 / reward_bins=128 at the
#     flagship's actual B=256 self-play batch, and
# (b) the paper-full preset (H=256, NB=10, S=100) with the same bins at
#     B=256 — the "flagship full config" of the r4 measurement, now
#     categorical.
# Target: >= 1.3x the XLA search at (a)/(b). Each command prints one JSON
# line; Pallas first (fast Mosaic compiles), XLA baselines after.
cd "$(dirname "$0")/.." || exit 1
set -x
python scripts/benchmark_mcts.py --mode small --boards 256 --sims 50 --max-depth 32 --value-bins 256 --reward-bins 128 --pallas --weight-dtype bfloat16
python scripts/benchmark_mcts.py --mode small --boards 256 --sims 50 --max-depth 32 --value-bins 256 --reward-bins 128 --pallas
python scripts/benchmark_mcts.py --mode full --boards 256 --sims 100 --max-depth 32 --value-bins 256 --reward-bins 128 --pallas --weight-dtype bfloat16
python scripts/benchmark_mcts.py --mode small --boards 256 --sims 50 --max-depth 32 --value-bins 256 --reward-bins 128
python scripts/benchmark_mcts.py --mode full --boards 256 --sims 100 --max-depth 32 --value-bins 256 --reward-bins 128
