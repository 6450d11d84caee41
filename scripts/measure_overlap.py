"""Measure actor/learner wall-clock overlap vs the serial trainer loop.

The async split (``parallel/actor_learner.py``) exists to overlap self-play
generation with optimization — this script produces the number that justifies
it (VERDICT round 1, weak #6):

- **serial**: the standard ``Trainer`` loop (generation interleaves with
  training in one process) — learner steps/s INCLUDING generation stalls.
- **overlapped**: a ``LearnerServer`` that never generates + one actor
  subprocess streaming trajectories — learner steps/s while generation
  happens elsewhere.

overlap_efficiency = overlapped_steps_per_s / solo_steps_per_s, where *solo*
is the learner stepping with no generation at all (upper bound). On disjoint
devices (the paper's 1 learner + 4 actor TPUs) overlapped → solo; on this
box's shared CPU cores the actor steals cycles, so the measured efficiency is
a LOWER bound for the disjoint-device deployment.

Usage: JAX_PLATFORMS=cpu python scripts/measure_overlap.py [--steps 120]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=120)
    parser.add_argument("--mode", choices=["tiny", "small"], default="tiny")
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    from dataclasses import replace

    from simulate_2048_tpu.parallel.actor_learner import LearnerServer
    from simulate_2048_tpu.training import Trainer, small_config, tiny_config

    base = {"tiny": tiny_config, "small": small_config}[args.mode]()
    # Frequent generation makes the serial loop pay visible generation stalls
    # (tiny default generates every 20 steps).
    config = replace(base, eval_interval=1 << 30, checkpoint_interval=1 << 30)

    def timed_steps(trainer: Trainer, n: int, generate: bool) -> float:
        """Steps/s of the serial trainer loop, with/without generation."""
        cfg = trainer.config if generate else replace(trainer.config, generation_interval=1 << 30)
        trainer.config = cfg
        t0 = time.perf_counter()
        trainer.train(n, verbose=False)
        return n / (time.perf_counter() - t0)

    # --- serial baseline (with generation) + solo upper bound (without) ----
    serial_trainer = Trainer(config, seed=0)
    serial_trainer.initialize()
    serial_trainer.fill_buffer(verbose=False)
    timed_steps(serial_trainer, 10, True)  # warmup/compile
    serial_sps = timed_steps(serial_trainer, args.steps, True)

    solo_trainer = Trainer(config, seed=0)
    solo_trainer.initialize()
    solo_trainer.fill_buffer(verbose=False)
    timed_steps(solo_trainer, 10, False)
    solo_sps = timed_steps(solo_trainer, args.steps, False)

    # --- overlapped: learner server + actor subprocess ---------------------
    learner_trainer = Trainer(config, seed=0)
    learner_trainer.initialize()
    server = LearnerServer(learner_trainer, port=0).start()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    actor = subprocess.Popen(
        [
            sys.executable, str(REPO / "scripts" / "actor_learner_demo.py"),
            "--role", "actor", "--mode", args.mode,
            "--host", server.address[0], "--port", str(server.address[1]),
            "--generations", "1000000",
        ],
        env=env, cwd=str(REPO),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        server.fill_buffer(timeout_s=600.0, verbose=False)
        server.run(10, verbose=False)  # warmup
        t0 = time.perf_counter()
        server.run(args.steps, verbose=False)
        overlapped_sps = args.steps / (time.perf_counter() - t0)
        traj_in = server.trajectories_received
    finally:
        actor.terminate()
        actor.wait(timeout=30)
        server.close()

    result = {
        "mode": args.mode,
        "steps": args.steps,
        "platform": "cpu-shared-cores" if os.environ.get("JAX_PLATFORMS") == "cpu" else "device",
        "serial_steps_per_s": serial_sps,
        "solo_steps_per_s": solo_sps,
        "overlapped_steps_per_s": overlapped_sps,
        "trajectory_batches_streamed": traj_in,
        "overlap_efficiency_vs_solo": overlapped_sps / solo_sps,
        "speedup_vs_serial": overlapped_sps / serial_sps,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
