"""BASELINE config 2 at full scale: lockstep batched random rollouts on the
device engine, seed-exact against the scalar NumPy oracle.

Runs B boards × T steps once on the device (one jitted scan) and replays a
verifiable subset (or all) on the host oracle, comparing boards and rewards
bitwise.

Usage: ``python scripts/verify_parity.py [--boards 4096] [--steps 128] [--check 256]``
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--boards", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=128)
    parser.add_argument("--check", type=int, default=256, help="boards to replay on the oracle")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import enable_compile_cache, respect_env_platforms

    respect_env_platforms()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np


    from simulate_2048_tpu.engine.board import create_initial_board_counter, next_state_counter
    from simulate_2048_tpu.engine.board import is_done as np_is_done
    from simulate_2048_tpu.engine.rng import derive_game_seeds_np, threefry2x32_np
    from simulate_2048_tpu.ops import board as jb
    from simulate_2048_tpu.ops import rng as jr

    b, t = args.boards, args.steps
    game_seeds = derive_game_seeds_np(args.seed, np.arange(b), np.zeros(b))

    # Action stream: same per-(board, step) counter hash on both sides.
    ACTION_STREAM = np.uint32(0x2048_0099)

    @jax.jit
    def device_rollout(seeds):
        boards = jb.create_initial_board(seeds)

        def step(carry, tt):
            boards, counts, done = carry
            a_bits, _ = jr.threefry2x32(
                (jnp.full((b,), ACTION_STREAM, jnp.uint32), seeds),
                (jnp.full((b,), tt, jnp.uint32), jnp.zeros((b,), jnp.uint32)),
            )
            actions = (a_bits & np.uint32(3)).astype(jnp.int32)
            b0, b1 = jr.spawn_bits(seeds, counts)
            nxt, reward, moved = jb.next_state(boards, actions, b0, b1)
            active = ~done
            boards = jnp.where(active[:, None, None], nxt, boards)
            counts = counts + (moved & active).astype(jnp.uint32)
            rew = jnp.where(active, reward, 0.0)
            done = done | jb.is_done(boards)
            return (boards, counts, done), rew

        init = (boards, jnp.full((b,), 2, jnp.uint32), jb.is_done(boards))
        (boards, counts, done), rewards = jax.lax.scan(step, init, jnp.arange(t, dtype=jnp.int32))
        return boards, jnp.sum(rewards, axis=0), counts

    t0 = time.time()
    dev_boards, dev_rewards, dev_counts = jax.device_get(device_rollout(jnp.asarray(game_seeds)))
    print(f"device: {b} boards x {t} steps in {time.time() - t0:.1f}s (incl. compile)")

    t0 = time.time()
    n_check = min(args.check, b)
    mismatches = 0
    for i in range(n_check):
        seed = int(game_seeds[i])
        board = create_initial_board_counter(seed)
        spawn_count, reward_sum = 2, 0.0
        for tt in range(t):
            if np_is_done(board):
                continue
            a_bits, _ = threefry2x32_np((ACTION_STREAM, np.uint32(seed)), (np.uint32(tt), np.uint32(0)))
            action = int(a_bits) & 3
            board, reward, moved = next_state_counter(board, action, seed, spawn_count)
            spawn_count += moved
            reward_sum += reward
        dev_vals = np.where(dev_boards[i] > 0, 2 ** dev_boards[i].astype(np.int64), 0)
        if not (np.array_equal(dev_vals, board) and abs(reward_sum - dev_rewards[i]) < 1e-3):
            mismatches += 1
            if mismatches <= 3:
                print(f"MISMATCH board {i}: oracle\n{board}\ndevice\n{dev_vals}")
    dt = time.time() - t0
    print(f"oracle replay: {n_check} boards in {dt:.1f}s — {mismatches} mismatches")
    if mismatches:
        sys.exit(1)
    print(f"PARITY OK: {n_check}/{b} boards bitwise-identical over {t} steps")


if __name__ == "__main__":
    main()
