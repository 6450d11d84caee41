"""Headline benchmark: batched random-rollout env throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 10M env-steps/s/chip from BASELINE.json
(the reference itself publishes no numbers — BASELINE.md).

Run from the repo root: ``python bench.py``.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 10_000_000.0  # BASELINE.json north star (v5p); we run on what's attached


def main() -> None:
    from simulate_2048_tpu.ops.rollout import random_rollout

    num_envs, num_steps = 65_536, 128
    if jax.default_backend() == "cpu":  # keep CI/CPU smoke runs quick
        num_envs, num_steps = 4_096, 32

    # Warmup / compile.
    jax.block_until_ready(random_rollout(jnp.uint32(1), num_envs, num_steps))

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        stats = jax.block_until_ready(random_rollout(jnp.uint32(2 + rep), num_envs, num_steps))
        best = min(best, time.perf_counter() - t0)

    rate = num_envs * num_steps / best
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(rate, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(rate / BASELINE_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
