"""Training CLI: ``python -m simulate_2048_tpu.train --mode tiny|small|full``.

Counterpart of ``reinforce/train.py:22-90`` (init → fill buffer → train →
final eval), plus a persistent JAX compilation cache so repeated runs skip
recompiles.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="Train Stochastic MuZero on 2048 (TPU-native)")
    parser.add_argument("--mode", choices=["tiny", "small", "full"], default="small")
    parser.add_argument("--steps", type=int, default=None, help="override training steps")
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    parser.add_argument("--log-dir", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--no-eval", action="store_true")
    parser.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard the learner batch over all visible devices (DP over a 'data' mesh)",
    )
    parser.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="FIELD=VALUE",
        help="override any TrainConfig field, e.g. --set codebook_entropy_weight=0.1 "
        "(repeatable; values parsed as Python literals, falling back to str)",
    )
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax

    from simulate_2048_tpu.training import Trainer, default_config, small_config, tiny_config

    config = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    if args.overrides:
        from simulate_2048_tpu.training.config import apply_overrides

        try:
            config = apply_overrides(config, args.overrides)
        except ValueError as e:
            parser.error(str(e))
        print(f"config overrides: {args.overrides}")
    print(f"mode={args.mode} devices={jax.devices()}")

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from simulate_2048_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"data-parallel over {len(jax.devices())} devices")

    trainer = Trainer(
        config,
        checkpoint_dir=args.checkpoint_dir,
        log_dir=args.log_dir,
        seed=args.seed,
        mesh=mesh,
    )
    trainer.initialize()
    trainer.fill_buffer()
    trainer.train(args.steps)

    if not args.no_eval:
        stats = trainer.evaluate()
        print("final evaluation:")
        for key, value in stats.items():
            print(f"  {key}: {value}")


if __name__ == "__main__":
    main()
