"""Pallas TPU kernel: multi-step random rollout fully in VMEM.

The XLA path (``ops/rollout.py``) is a ``lax.scan`` whose carry round-trips
through HBM every step and whose per-step program re-launches. This kernel
runs ALL ``num_steps`` env steps inside one Pallas program per batch block:
boards live in registers/VMEM as (16, B) row-vectors (cells in sublanes,
batch in lanes), so the hot loop is pure VPU work with zero HBM traffic
until the final write-back.

Bitwise-identical to ``random_rollout``'s semantics: same Threefry-2x32
counter streams for actions and spawns (``ops/rng.py`` spec), same auto-reset
reseeding, so the two paths are differential-testable against each other
(``tests/test_pallas.py``).

Layout notes (see /opt/skills/guides/pallas_guide.md):
- block = (16, BLOCK_B) int32: 16 cells in sublanes, boards in lanes;
- every intermediate is a (1, BLOCK_B) row vector — elementwise VPU ops;
- per-board direction dispatch is a 4-way select over cell permutations
  (rotations are free: they only permute which row vector feeds which slot).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simulate_2048_tpu.ops import rng as tfrng

Array = jax.Array

BLOCK_B = 512  # boards per kernel instance (lanes); must divide the batch

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)
ACTION_STREAM = np.uint32(0x2048_0003)


def _rotl(x, d):
    return (x << d) | (x >> (32 - d))


def _threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32 on row vectors (same bijection as ops.rng.threefry2x32)."""
    k2 = _PARITY ^ k0 ^ k1
    ks = (k0, k1, k2)
    x0 = c0 + k0
    x1 = c1 + k1
    for r in range(20):
        x0 = x0 + x1
        x1 = _rotl(x1, _ROT[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + np.uint32(j)
    return x0, x1


def _spawn_bits(game_seed, spawn_index):
    zero = jnp.zeros_like(game_seed)
    return _threefry2x32(tfrng.SPAWN_STREAM + zero, game_seed, spawn_index, zero)


def _slide_row_left(cells):
    """Slide+merge one 4-cell oriented row of vectors; returns (cells, score).

    Same algorithm as ``ops.board``: 3 bubble compaction passes, 3 sequential
    pair merges, final compaction — all elementwise over the lane axis.
    """
    e0, e1, e2, e3 = cells

    def compact(e0, e1, e2, e3):
        for _ in range(3):
            m = e0 == 0
            e0, e1 = jnp.where(m, e1, e0), jnp.where(m, 0, e1)
            m = e1 == 0
            e1, e2 = jnp.where(m, e2, e1), jnp.where(m, 0, e2)
            m = e2 == 0
            e2, e3 = jnp.where(m, e3, e2), jnp.where(m, 0, e3)
        return e0, e1, e2, e3

    e0, e1, e2, e3 = compact(e0, e1, e2, e3)
    score = jnp.zeros_like(e0)
    m = (e0 == e1) & (e0 != 0)
    score += jnp.where(m, jnp.int32(2) << e0, 0)
    e0, e1 = jnp.where(m, e0 + 1, e0), jnp.where(m, 0, e1)
    m = (e1 == e2) & (e1 != 0)
    score += jnp.where(m, jnp.int32(2) << e1, 0)
    e1, e2 = jnp.where(m, e1 + 1, e1), jnp.where(m, 0, e2)
    m = (e2 == e3) & (e2 != 0)
    score += jnp.where(m, jnp.int32(2) << e2, 0)
    e2, e3 = jnp.where(m, e2 + 1, e2), jnp.where(m, 0, e3)
    e0, e1, e2, e3 = compact(e0, e1, e2, e3)
    return [e0, e1, e2, e3], score


# cell index maps: oriented(k)[row r][pos i] = cells[_CELL_MAP[k][r][i]]
_CELL_MAP = [
    [[4 * r + i for i in range(4)] for r in range(4)],  # left
    [[4 * i + r for i in range(4)] for r in range(4)],  # up
    [[4 * r + (3 - i) for i in range(4)] for r in range(4)],  # right
    [[4 * (3 - i) + r for i in range(4)] for r in range(4)],  # down
]


def _apply_action_cells(cells, action):
    """Per-board slide in direction ``action`` on 16 cell row-vectors."""
    is_k = [action == k for k in range(4)]

    slid = []
    scores = []
    for r in range(4):
        row = []
        for i in range(4):
            v = cells[_CELL_MAP[0][r][i]]
            for k in (1, 2, 3):
                v = jnp.where(is_k[k], cells[_CELL_MAP[k][r][i]], v)
            row.append(v)
        new_row, sc = _slide_row_left(row)
        slid.append(new_row)
        scores.append(sc)
    score = scores[0] + scores[1] + scores[2] + scores[3]

    # Inverse mapping: new cell (a, b) pulls from slid[r][i] with
    # (r, i) = the oriented coordinates that map onto (a, b) for each k.
    new_cells = []
    for a in range(4):
        for b in range(4):
            v = slid[a][b]  # k=0
            v = jnp.where(is_k[1], slid[b][a], v)
            v = jnp.where(is_k[2], slid[a][3 - b], v)
            v = jnp.where(is_k[3], slid[b][3 - a], v)
            new_cells.append(v)
    return new_cells, score


def _spawn_on_cells(cells, bits0, bits1):
    """Place one tile at the ``mulhi32(bits0, num_empty)``-th empty cell
    (row-major) — the spec's uniform pick (``ops.board.spawn_rank``), using
    int32-only 16-bit-limb arithmetic (Mosaic has no unsigned vector div/mod/max).
    """
    empty = [(c == 0).astype(jnp.int32) for c in cells]
    num_empty = empty[0]
    for e in empty[1:]:
        num_empty = num_empty + e
    hi = (bits0 >> 16).astype(jnp.int32)
    lo = (bits0 & np.uint32(0xFFFF)).astype(jnp.int32)
    rank = (hi * num_empty + ((lo * num_empty) >> 16)) >> 16
    new_exp = jnp.where(bits1 < tfrng.FOUR_THRESHOLD, jnp.int32(2), jnp.int32(1))

    out = []
    csum = jnp.zeros_like(num_empty)
    for c, e in zip(cells, empty):
        csum = csum + e
        hit = (e == 1) & (csum == rank + 1) & (num_empty > 0)
        out.append(jnp.where(hit, new_exp, c))
    return out


def _is_done_cells(cells):
    full = cells[0] != 0
    for c in cells[1:]:
        full = full & (c != 0)
    h_eq = jnp.zeros_like(full)
    v_eq = jnp.zeros_like(full)
    for r in range(4):
        for i in range(3):
            h_eq = h_eq | (cells[4 * r + i] == cells[4 * r + i + 1])
    for i in range(4):
        for r in range(3):
            v_eq = v_eq | (cells[4 * r + i] == cells[4 * (r + 1) + i])
    return full & ~h_eq & ~v_eq


def _fresh_board_cells(game_seed):
    cells = [jnp.zeros_like(game_seed).astype(jnp.int32) for _ in range(16)]
    for i in (0, 1):
        b0, b1 = _spawn_bits(game_seed, jnp.full_like(game_seed, i))
        cells = _spawn_on_cells(cells, b0, b1)
    return cells


def _rollout_kernel(num_steps: int, seed_ref, boards_ref, episodes_ref, reward_ref, maxtile_ref):
    """One batch block: run ``num_steps`` auto-reset random env steps.

    All values are (1, BLOCK_B) row vectors — 2D as TPU layouts require.
    """
    game_seed = seed_ref[0:1, :]
    cells = _fresh_board_cells(game_seed)
    spawn_count = jnp.full_like(game_seed, 2)
    episode = jnp.zeros_like(game_seed)
    episodes_done = jnp.zeros_like(game_seed, dtype=jnp.int32)
    reward_sum = jnp.zeros_like(game_seed, dtype=jnp.float32)
    max_exp = jnp.zeros_like(game_seed, dtype=jnp.int32)

    def step(t, carry):
        cells, game_seed, spawn_count, episode, episodes_done, reward_sum, max_exp = carry
        t32 = jnp.full_like(game_seed, 0) + t.astype(jnp.uint32)

        # Action stream — identical to ops.rollout.random_rollout.
        a_bits, _ = _threefry2x32(
            ACTION_STREAM + jnp.zeros_like(game_seed), game_seed, t32, spawn_count
        )
        action = (a_bits & np.uint32(3)).astype(jnp.int32)

        new_cells, score = _apply_action_cells(cells, action)
        moved = jnp.zeros_like(action, dtype=jnp.bool_)
        for c_new, c_old in zip(new_cells, cells):
            moved = moved | (c_new != c_old)

        b0, b1 = _spawn_bits(game_seed, spawn_count)
        spawned = _spawn_on_cells(new_cells, b0, b1)
        cells = [jnp.where(moved, s, o) for s, o in zip(spawned, cells)]
        reward = jnp.where(moved, score.astype(jnp.float32), 0.0)
        spawn_count = spawn_count + moved.astype(jnp.uint32)
        reward_sum = reward_sum + reward

        done = _is_done_cells(cells)
        episodes_done = episodes_done + done.astype(jnp.int32)

        for c in cells:
            max_exp = jnp.maximum(max_exp, c)

        # Auto-reset (same reseed rule as env.step_auto_reset).
        next_ep = episode + 1
        reseed, _ = _threefry2x32(
            tfrng.GAME_SEED_STREAM + jnp.zeros_like(game_seed),
            jnp.zeros_like(game_seed),
            game_seed,
            next_ep,
        )
        fresh = _fresh_board_cells(reseed)
        cells = [jnp.where(done, f, c) for f, c in zip(fresh, cells)]
        game_seed = jnp.where(done, reseed, game_seed)
        spawn_count = jnp.where(done, jnp.full_like(spawn_count, 2), spawn_count)
        episode = jnp.where(done, next_ep, episode)

        return (cells, game_seed, spawn_count, episode, episodes_done, reward_sum, max_exp)

    carry = (cells, game_seed, spawn_count, episode, episodes_done, reward_sum, max_exp)
    carry = jax.lax.fori_loop(0, num_steps, step, carry)
    cells, game_seed, spawn_count, episode, episodes_done, reward_sum, max_exp = carry

    for c_idx in range(16):
        boards_ref[c_idx : c_idx + 1, :] = cells[c_idx]
    episodes_ref[0:1, :] = episodes_done
    reward_ref[0:1, :] = reward_sum
    maxtile_ref[0:1, :] = jnp.where(max_exp > 0, jnp.int32(1) << max_exp, 0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def pallas_random_rollout(
    seeds: Array, num_steps: int, block_b: int = BLOCK_B, interpret: bool = False
) -> tuple[Array, Array, Array, Array]:
    """Run the VMEM-resident rollout kernel.

    Parameters
    ----------
    seeds : (B,) uint32 per-board game seeds (B divisible by ``block_b``).
    num_steps : env steps per board.

    Returns (final boards (B, 4, 4) int32 exponents, episodes_finished (B,),
    reward_sum (B,), max_tile (B,)).
    """
    b = seeds.shape[0]
    assert b % block_b == 0, f"batch {b} must be divisible by block {block_b}"
    grid = (b // block_b,)

    boards, episodes, rewards, maxtile = pl.pallas_call(
        partial(_rollout_kernel, num_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
        ],
        interpret=interpret,
    )(seeds.reshape(1, b))

    final_boards = jnp.moveaxis(boards.reshape(4, 4, b), -1, 0)
    return final_boards, episodes[0], rewards[0], maxtile[0]
