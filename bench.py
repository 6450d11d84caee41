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

from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

respect_env_platforms()
enable_compile_cache()

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 10_000_000.0  # BASELINE.json north star (v5p); we run on what's attached


def main() -> None:
    on_tpu = jax.default_backend() != "cpu"
    num_envs, num_steps = (65_536, 128) if on_tpu else (4_096, 32)

    if on_tpu:
        # VMEM-resident Pallas rollout kernel (boards never touch HBM
        # between steps) — ~2x the XLA-scan path.
        from simulate_2048_tpu.ops import rng as tfrng
        from simulate_2048_tpu.ops.pallas_rollout import pallas_random_rollout

        @jax.jit
        def _run(seed):
            # Everything (incl. seed derivation) under one jit: eager dispatch
            # over a remote-attached TPU costs ~100ms/op.
            seeds = tfrng.derive_game_seeds(
                seed, jnp.arange(num_envs, dtype=jnp.uint32), jnp.zeros(num_envs, jnp.uint32)
            )
            _, episodes, _, _ = pallas_random_rollout(seeds, num_steps)
            return jnp.sum(episodes)

        def run(seed: int) -> int:
            return int(_run(jnp.uint32(seed)))

    else:
        from simulate_2048_tpu.ops.rollout import random_rollout

        def run(seed: int) -> int:
            return int(random_rollout(jnp.uint32(seed), num_envs, num_steps).episodes_finished)

    # Warmup / compile. NOTE: timing is anchored on a host fetch of a scalar
    # result, not block_until_ready — on the remote-attached TPU backend the
    # first block_until_ready can return before the work has drained.
    run(1)

    # Best-of-N with the full sample recorded: the round-1→round-2 result
    # drifted 10.5% with nothing logged to attribute it to (VERDICT r2 #9) —
    # the per-rep times + backend/shape provenance make future drift
    # bisectable from the JSON line alone.
    reps = 5
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        run(2 + rep)  # host fetch inside forces device→host sync
        times.append(time.perf_counter() - t0)
    best = min(times)

    rate = num_envs * num_steps / best
    # Version/toolchain provenance (VERDICT r4 weak #4): round-to-round drift
    # attribution needs to distinguish code/compiler changes from environment
    # changes — record everything the drift rule in docs/project.md consults.
    provenance: dict = {"jax": jax.__version__}
    try:
        import jaxlib

        provenance["jaxlib"] = jaxlib.__version__
    except Exception:
        pass
    try:
        import importlib.metadata as _md

        for pkg in ("libtpu", "libtpu-nightly", "axon"):
            try:
                provenance[pkg] = _md.version(pkg)
            except _md.PackageNotFoundError:
                pass
    except Exception:
        pass
    import os

    provenance["compile_cache"] = (
        "warm" if os.path.isdir(".jax_cache") and os.listdir(".jax_cache") else "cold"
    )
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(rate, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(rate / BASELINE_STEPS_PER_S, 3),
                "backend": "pallas_rollout" if on_tpu else "xla_scan",
                "jax_platform": jax.default_backend(),
                "device": str(jax.devices()[0].device_kind),
                "num_envs": num_envs,
                "num_steps": num_steps,
                "reps": reps,
                "times_s": [round(t, 4) for t in times],
                **provenance,
            }
        )
    )


if __name__ == "__main__":
    main()
