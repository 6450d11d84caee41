"""Checkpoint autopsy: decompose the post-peak eval decline by search variant.

Round-2 soaks all peak at the first eval then decline (docs/project.md). This
tool discriminates WHERE the rot lives by re-evaluating saved checkpoints with
the policy prior ablated and/or the simulation budget raised:

- If ``flat_prior`` (search ignores the policy head: uniform prior over legal
  moves) recovers the lost score, the policy prior is what degrades — the
  visit-distribution → prior → visit-distribution feedback loop sharpens the
  prior onto its own beliefs and search stops correcting it. Value/dynamics
  are then exonerated.
- If ``sims200`` recovers it, the prior is recoverable with more search —
  same diagnosis, milder.
- If NOTHING recovers it, the value/reward/dynamics stack itself degraded.

Usage (on the attached TPU, from /root/repo):
    python scripts/autopsy_eval.py --ckpt-dir runs/soak_r2v3c/ckpt \
        --steps 5000 10000 15000 --games 32
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp

from simulate_2048_tpu.training.checkpoint import CheckpointManager
from simulate_2048_tpu.training.config import small_config
from simulate_2048_tpu.training.learner import create_train_state
from simulate_2048_tpu.training.self_play import evaluate_games


def flat_prior_fns(apply_fns):
    """Wrap the prediction head so search sees a uniform policy prior."""
    real_prediction = apply_fns.prediction

    def prediction(params, hidden):
        logits, value = real_prediction(params, hidden)
        return jnp.zeros_like(logits), value

    return apply_fns._replace(prediction=prediction)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt-dir", default="runs/soak_r2v3c/ckpt")
    parser.add_argument("--steps", type=int, nargs="+", default=[5000, 10000, 15000])
    parser.add_argument("--games", type=int, default=32)
    parser.add_argument("--sims", type=int, default=200, help="raised sim budget variant")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    cfg = small_config()
    cfg_sims = dataclasses.replace(cfg, num_simulations=args.sims)
    key = jax.random.PRNGKey(args.seed)  # SAME key everywhere: seed-matched games

    state, network = create_train_state(jax.random.PRNGKey(0), cfg)
    flat_fns = flat_prior_fns(network.apply_fns)

    variants = [
        ("base", network.apply_fns, cfg),
        ("flat_prior", flat_fns, cfg),
        (f"sims{args.sims}", network.apply_fns, cfg_sims),
        (f"flat_sims{args.sims}", flat_fns, cfg_sims),
    ]

    def report(tag: str, params) -> None:
        for name, fns, c in variants:
            stats = evaluate_games(params, fns, key, c, args.games)
            print(
                json.dumps(
                    {
                        "ckpt": tag,
                        "variant": name,
                        "mean_reward": round(stats["mean_reward"], 1),
                        "sem": round(stats["sem_reward"], 1),
                        "max_tile": stats["max_tile"],
                        "reached_512": stats["reached_512"],
                        "mean_length": round(stats["mean_length"], 1),
                        "search_value": round(stats["mean_search_value"], 2),
                        "search_entropy": round(stats["mean_search_entropy"], 3),
                    }
                ),
                flush=True,
            )

    report("random_init", state.params)

    mgr = CheckpointManager(args.ckpt_dir)
    for step in args.steps:
        restored = mgr.restore(state, step=step)
        report(f"step{step}", restored.params)


if __name__ == "__main__":
    main()
