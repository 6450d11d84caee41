"""Asynchronous actor/learner demo — the paper's 1-learner + N-actor split.

Launch the learner, then any number of actors (separate processes; on a pod,
separate hosts — give actors the learner host's address):

  python scripts/actor_learner_demo.py --role learner --steps 200 &
  python scripts/actor_learner_demo.py --role actor --actor-seed 1 &
  python scripts/actor_learner_demo.py --role actor --actor-seed 2 &

The learner never generates games: it fills its replay buffer from actor
streams, trains continuously, and publishes parameters the actors pull
between generations (``simulate_2048_tpu/parallel/actor_learner.py``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--role", choices=["learner", "actor"], required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=29517)
    parser.add_argument("--mode", choices=["tiny", "small", "full"], default="tiny")
    parser.add_argument("--steps", type=int, default=100, help="learner optimization steps")
    parser.add_argument("--generations", type=int, default=20, help="actor self-play rounds")
    parser.add_argument("--actor-seed", type=int, default=0)
    parser.add_argument("--fill-timeout", type=float, default=300.0)
    parser.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="FIELD=VALUE",
        help="override any TrainConfig field (repeatable)",
    )
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import ast
    import dataclasses

    from simulate_2048_tpu.training import Trainer, default_config, small_config, tiny_config

    config = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    overrides = {}
    for item in args.overrides:
        key, _, raw = item.partition("=")
        try:
            overrides[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            overrides[key] = raw
    if overrides:
        config = dataclasses.replace(config, **overrides)

    if args.role == "learner":
        from simulate_2048_tpu.parallel import LearnerServer

        trainer = Trainer(config)
        trainer.initialize()
        server = LearnerServer(trainer, host=args.host, port=args.port).start()
        print(f"learner listening on {server.address[0]}:{server.address[1]}", flush=True)
        try:
            server.fill_buffer(timeout_s=args.fill_timeout)
            final = server.run(args.steps)
            stats = trainer.evaluate()
            print(
                f"learner done: step {final.get('step')} loss {final.get('total_loss'):.4f} "
                f"traj_batches {server.trajectories_received} params_served {server.params_served} "
                f"eval_reward {stats['mean_reward']:.1f}",
                flush=True,
            )
        finally:
            server.close()
    else:
        from simulate_2048_tpu.parallel import ActorClient

        actor = ActorClient(config, (args.host, args.port), seed=args.actor_seed)
        actor.run(
            args.generations,
            on_generation=lambda g, step: print(
                f"actor {args.actor_seed}: generation {g} (learner step {step})", flush=True
            ),
        )
        print(f"actor {args.actor_seed} done: {actor.generations} generations", flush=True)
        actor.close()


if __name__ == "__main__":
    main()
