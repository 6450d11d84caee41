"""Model-accuracy probe: which component binds play strength?

Round-2 recipes hold eval ~2350-2600 with calibrated-looking values
(docs/project.md). This tool decomposes a checkpoint's MODEL quality on
fresh on-policy data, separating the candidate bottlenecks the eval curve
can't distinguish:

1. reward-model error  — r̂ = g(φ(h(o),a), oracle code) vs the true env
   reward, grouped by reward magnitude (h-space and raw);
2. value calibration   — v(h(o_t)) vs the realized within-segment
   discounted return-to-go (corr + bias);
3. prior quality       — top-1 agreement between f's policy prior and the
   search's chosen action;
4. unroll drift        — relative L2 distance between the unrolled hidden
   state after k steps and the re-encoded h(o_{t+k}), k = 1..K.

Usage (TPU or CPU):
    python scripts/model_probe.py --ckpt-dir runs/champion_r2/ckpt [--step N]
        [--games 64] [--mode small]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt-dir", required=True)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--games", type=int, default=64)
    parser.add_argument("--mode", choices=["tiny", "small", "full"], default="small")
    parser.add_argument("--seed", type=int, default=123)
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from simulate_2048_tpu.ops.value_transform import inverse_scale_value, scale_value
    from simulate_2048_tpu.training.checkpoint import CheckpointManager
    from simulate_2048_tpu.training.config import default_config, small_config, tiny_config
    from simulate_2048_tpu.training.learner import create_train_state
    from simulate_2048_tpu.training.losses import oracle_chance_targets
    from simulate_2048_tpu.training.self_play import play_games

    cfg = {"tiny": tiny_config, "small": small_config, "full": default_config}[args.mode]()
    state, network = create_train_state(jax.random.PRNGKey(0), cfg)
    restored = CheckpointManager(args.ckpt_dir).restore(state, step=args.step)
    if restored is None:
        raise SystemExit(f"no checkpoint in {args.ckpt_dir}")
    params = restored.params
    fns = network.apply_fns
    eps = cfg.value_epsilon

    # fresh on-policy data (temperature 1.0, one segment per game)
    traj = play_games(
        params, fns, jax.random.PRNGKey(args.seed), jnp.float32(1.0), cfg, args.games
    )
    boards = np.asarray(traj.boards)  # (B, T+1, 16) int8
    actions = np.asarray(traj.actions)
    rewards = np.asarray(traj.rewards)
    lengths = np.asarray(traj.length)
    b, t = rewards.shape

    obs_all = jnp.asarray(boards, jnp.float32) / 16.0  # (B, T+1, 16)
    mask = np.arange(t)[None, :] < lengths[:, None]

    @jax.jit
    def probe(obs, acts):
        """Per-(B,T) model quantities via batched applies."""
        k_unroll = cfg.num_unroll_steps
        flat_obs = obs[:, :-1].reshape(-1, 16)
        hidden = fns.representation(params.representation, flat_obs)
        logits, v = fns.prediction(params.prediction, hidden)
        v_raw = inverse_scale_value(v, eps)

        # one-step reward with the ORACLE chance code
        def per_game(o_seq, a_seq):
            code_oh, _, spawned = oracle_chance_targets(o_seq, a_seq, cfg.codebook_size)
            return code_oh, spawned

        codes, spawned = jax.vmap(per_game)(obs, acts)  # (B, T, C), (B, T)
        h0 = fns.representation(params.representation, obs[:, :-1].reshape(-1, 16))
        a_oh = jax.nn.one_hot(acts.reshape(-1), cfg.action_size)
        after = fns.afterstate_dynamics(params.afterstate_dynamics, h0, a_oh)
        nxt, r_hat = fns.dynamics(params.dynamics, after, codes.reshape(-1, cfg.codebook_size))
        r_hat_raw = inverse_scale_value(r_hat, eps)

        # unroll drift: re-encode o_{t+1} and compare to the unrolled hidden
        h1_true = fns.representation(params.representation, obs[:, 1:].reshape(-1, 16))
        drift1 = jnp.linalg.norm(nxt - h1_true, axis=-1) / (
            jnp.linalg.norm(h1_true, axis=-1) + 1e-9
        )
        return (
            logits.reshape(b, t, -1),
            v_raw.reshape(b, t),
            r_hat_raw.reshape(b, t),
            spawned,
            drift1.reshape(b, t),
        )

    logits, v_raw, r_hat, spawned, drift1 = map(np.asarray, probe(obs_all, jnp.asarray(actions)))

    # 1. reward model
    valid = mask & spawned.astype(bool)
    r_true = rewards
    h_err = np.abs(
        np.asarray(scale_value(jnp.asarray(r_hat), eps))
        - np.asarray(scale_value(jnp.asarray(r_true), eps))
    )
    out = {"ckpt": args.ckpt_dir, "step": int(restored.step), "positions": int(valid.sum())}
    out["reward_mae_raw"] = float(np.abs(r_hat - r_true)[valid].mean())
    out["reward_mae_h"] = float(h_err[valid].mean())
    for lo, hi, tag in [(0, 1, "r0"), (1, 9, "r4_8"), (9, 33, "r16_32"), (33, 1e9, "r_big")]:
        sel = valid & (r_true >= lo) & (r_true < hi)
        if sel.sum():
            out[f"reward_mae_raw/{tag}"] = float(np.abs(r_hat - r_true)[sel].mean())
            out[f"count/{tag}"] = int(sel.sum())

    # 2. value calibration vs realized discounted return-to-go (within segment)
    gamma = cfg.discount
    g_ret = np.zeros_like(rewards)
    acc = np.zeros(b)
    for i in range(t - 1, -1, -1):
        acc = np.where(mask[:, i], rewards[:, i] + gamma * acc, acc)
        g_ret[:, i] = acc
    vv, gg = v_raw[mask], g_ret[mask]
    out["value_corr"] = float(np.corrcoef(vv, gg)[0, 1])
    out["value_mean"] = float(vv.mean())
    out["return_mean"] = float(gg.mean())
    out["value_bias"] = float((vv - gg).mean())
    out["value_mae_h"] = float(
        np.abs(
            np.asarray(scale_value(jnp.asarray(vv), eps))
            - np.asarray(scale_value(jnp.asarray(gg), eps))
        ).mean()
    )

    # 3. prior top-1 agreement with the executed (search-chosen) action
    prior_top1 = logits.argmax(-1)
    out["prior_top1_agreement"] = float((prior_top1 == actions)[mask].mean())

    # 4. one-step hidden drift
    out["hidden_drift_1step"] = float(drift1[mask].mean())

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
