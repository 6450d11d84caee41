"""Vectorized 2048 board kernels on exponent boards.

Boards are stored as **exponents**: int32 ``(…, 4, 4)`` with 0 = empty and
``e`` = tile value ``2**e``. Exponents (not raw values, as the reference keeps
at ``twentyfortyeight/core/gameboard.py``) are the TPU-native choice: every
operation below is branchless, elementwise arithmetic over the batch — no
gathers, no sorts, no data-dependent shapes — so XLA lays the batch dimension
across vector lanes and the whole env step fuses into a handful of VPU ops.

Semantics match the reference engine exactly (cited per function):
- slide left compacts zeros, merges adjacent equal tiles once, left-to-right,
  score = sum of created tile values               (``gameboard.py:23-102``)
- actions 0=left, 1=up, 2=right, 3=down via rotation (``gameboard.py:105-129``)
- invalid move => unchanged board, reward 0, no spawn (``gameboard.py:291-325``)
- spawn: uniform empty cell, 90% a 2 / 10% a 4        (``gameboard.py:247-288``)
  driven by the counter-based spec in ``ops/rng.py``
- done: no legal move in any direction                (``gameboard.py:328-348``)

All functions are jit-compilable and batch over arbitrary leading dims.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from simulate_2048_tpu.ops import rng as tfrng

Array = jax.Array

BOARD_SIZE = 4
NUM_ACTIONS = 4
# Largest representable tile is 2**16 = 65536 (theoretical max on a 4x4 board),
# matching the observation normalizer of the reference (``core.py:374``).
MAX_EXPONENT = 16


def values_to_exponents(board_values: Array) -> Array:
    """Convert a raw-value board (0, 2, 4, 8, …) to exponents (0, 1, 2, 3, …)."""
    v = board_values.astype(jnp.float32)
    exp = jnp.where(v > 0, jnp.log2(jnp.maximum(v, 1.0)), 0.0)
    return jnp.round(exp).astype(jnp.int32)


def exponents_to_values(board_exp: Array) -> Array:
    """Convert an exponent board back to raw tile values."""
    return jnp.where(board_exp > 0, jnp.left_shift(jnp.int32(1), board_exp), 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Slide + merge (the hot kernel)
# ---------------------------------------------------------------------------


def _compact_rows_left(rows: Array) -> Array:
    """Push nonzero entries of each length-4 row to the left, preserving order.

    Three bubble passes of adjacent compare-exchanges fully compact 4 cells.
    Each exchange is two ``where`` ops — elementwise over any batch shape.
    """
    e0, e1, e2, e3 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
    for _ in range(3):
        # pair (0,1)
        m = e0 == 0
        e0, e1 = jnp.where(m, e1, e0), jnp.where(m, 0, e1)
        # pair (1,2)
        m = e1 == 0
        e1, e2 = jnp.where(m, e2, e1), jnp.where(m, 0, e2)
        # pair (2,3)
        m = e2 == 0
        e2, e3 = jnp.where(m, e3, e2), jnp.where(m, 0, e3)
    return jnp.stack([e0, e1, e2, e3], axis=-1)


def _merge_rows_left(rows: Array) -> tuple[Array, Array]:
    """Merge a compacted row left-to-right, each tile merging at most once.

    Returns (merged rows — still needing a final compaction — and per-row
    score). Because merging pair (i, i+1) zeroes cell i+1, the next pair's
    equality test fails automatically, which reproduces the merge-once,
    left-to-right rule of ``gameboard.py:54-67`` with no flags.
    """
    e0, e1, e2, e3 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
    score = jnp.zeros(rows.shape[:-1], dtype=jnp.int32)

    m = (e0 == e1) & (e0 != 0)
    score = score + jnp.where(m, jnp.left_shift(jnp.int32(2), e0), 0)  # 2**(e0+1)
    e0, e1 = jnp.where(m, e0 + 1, e0), jnp.where(m, 0, e1)

    m = (e1 == e2) & (e1 != 0)
    score = score + jnp.where(m, jnp.left_shift(jnp.int32(2), e1), 0)
    e1, e2 = jnp.where(m, e1 + 1, e1), jnp.where(m, 0, e2)

    m = (e2 == e3) & (e2 != 0)
    score = score + jnp.where(m, jnp.left_shift(jnp.int32(2), e2), 0)
    e2, e3 = jnp.where(m, e2 + 1, e2), jnp.where(m, 0, e3)

    return jnp.stack([e0, e1, e2, e3], axis=-1), score


def slide_rows_left(rows: Array) -> tuple[Array, Array]:
    """Slide length-4 exponent rows left with merging.

    Parameters
    ----------
    rows : int32 (…, 4)

    Returns
    -------
    (new_rows, score) with score = sum of created tile values per row.
    """
    compacted = _compact_rows_left(rows)
    merged, score = _merge_rows_left(compacted)
    return _compact_rows_left(merged), score


def slide_and_merge(board_exp: Array) -> tuple[Array, Array]:
    """Slide a whole (…, 4, 4) board left. Returns (new_board, total score)."""
    new_board, row_scores = slide_rows_left(board_exp)
    return new_board, jnp.sum(row_scores, axis=-1)


# ---------------------------------------------------------------------------
# Rotation-free per-board actions
# ---------------------------------------------------------------------------
#
# The reference rotates the board k times and slides left
# (``gameboard.py:105-129``; the JAX engine even computes all four slides and
# indexes, ``core.py:156-170``). Here each direction is its own cheap layout
# transform of the SAME slide kernel — one slide per step, 4x less compute:
#   left  : slide rows
#   right : reverse rows, slide, reverse
#   up    : transpose, slide, transpose
#   down  : transpose+reverse, slide, reverse+transpose
# Per-board action dispatch is a branchless 4-way select.


def _oriented(board_exp: Array, action_index: int) -> Array:
    if action_index == 0:  # left
        return board_exp
    if action_index == 1:  # up
        return jnp.swapaxes(board_exp, -1, -2)
    if action_index == 2:  # right
        return board_exp[..., ::-1]
    # down
    return jnp.swapaxes(board_exp, -1, -2)[..., ::-1]


def _unoriented(board_exp: Array, action_index: int) -> Array:
    if action_index == 0:
        return board_exp
    if action_index == 1:
        return jnp.swapaxes(board_exp, -1, -2)
    if action_index == 2:
        return board_exp[..., ::-1]
    return jnp.swapaxes(board_exp[..., ::-1], -1, -2)


def apply_action(board_exp: Array, action: Array) -> tuple[Array, Array]:
    """Deterministic afterstate: slide in ``action``'s direction, no spawn.

    The reference calls this ``latent_state`` (``gameboard.py:105``). Works for
    scalar or batched ``action`` (broadcast against the board's batch dims).

    Returns (afterstate board, merge score as int32).
    """
    oriented = jnp.stack([_oriented(board_exp, a) for a in range(NUM_ACTIONS)], axis=0)
    slid, scores = slide_rows_left(oriented)
    restored = jnp.stack([_unoriented(slid[a], a) for a in range(NUM_ACTIONS)], axis=0)

    onehot = jax.nn.one_hot(action, NUM_ACTIONS, dtype=board_exp.dtype)  # (…, 4)
    sel = jnp.moveaxis(onehot, -1, 0)  # (4, …)
    new_board = jnp.sum(restored * sel[..., None, None], axis=0)
    score = jnp.sum(jnp.sum(scores, axis=-1) * jnp.moveaxis(onehot, -1, 0), axis=0)
    return new_board.astype(board_exp.dtype), score.astype(jnp.int32)


def latent_state(board_exp: Array, action: Array) -> tuple[Array, Array]:
    """Alias for :func:`apply_action` mirroring the reference name."""
    return apply_action(board_exp, action)


# ---------------------------------------------------------------------------
# Legality / termination — single-pass adjacency tests
# ---------------------------------------------------------------------------


def legal_actions_mask(board_exp: Array) -> Array:
    """Boolean (…, 4) mask [left, up, right, down] of moves that change the board.

    Single-pass adjacency formulation (the reference's NumPy fast path,
    ``gamemove.py:45-83``) rather than apply-all-4-and-compare
    (``core.py:276-302``): pure elementwise compares, no slides.
    """
    left_cols, right_cols = board_exp[..., :, :-1], board_exp[..., :, 1:]
    top_rows, bottom_rows = board_exp[..., :-1, :], board_exp[..., 1:, :]

    h_merge = (left_cols != 0) & (left_cols == right_cols)
    v_merge = (top_rows != 0) & (top_rows == bottom_rows)

    def _any(x: Array) -> Array:
        return jnp.any(x, axis=(-1, -2))

    left = _any((left_cols == 0) & (right_cols != 0)) | _any(h_merge)
    right = _any((right_cols == 0) & (left_cols != 0)) | _any(h_merge)
    up = _any((top_rows == 0) & (bottom_rows != 0)) | _any(v_merge)
    down = _any((bottom_rows == 0) & (top_rows != 0)) | _any(v_merge)
    return jnp.stack([left, up, right, down], axis=-1)


def is_done(board_exp: Array) -> Array:
    """True when no direction changes the board (``gameboard.py:328-348``)."""
    full = jnp.all(board_exp != 0, axis=(-1, -2))
    left_cols, right_cols = board_exp[..., :, :-1], board_exp[..., :, 1:]
    top_rows, bottom_rows = board_exp[..., :-1, :], board_exp[..., 1:, :]
    h_eq = jnp.any(left_cols == right_cols, axis=(-1, -2))
    v_eq = jnp.any(top_rows == bottom_rows, axis=(-1, -2))
    return full & ~h_eq & ~v_eq


def count_empty(board_exp: Array) -> Array:
    """Number of empty cells (``core.py:446``)."""
    return jnp.sum((board_exp == 0).astype(jnp.int32), axis=(-1, -2))


def max_tile(board_exp: Array) -> Array:
    """Maximum tile value on the board (``core.py:428``)."""
    return jnp.max(exponents_to_values(board_exp), axis=(-1, -2))


# ---------------------------------------------------------------------------
# Stochastic spawn (counter-based, see ops/rng.py for the spec)
# ---------------------------------------------------------------------------


def spawn_rank(bits0: Array, num_empty: Array) -> Array:
    """Uniform cell rank in [0, num_empty): ``mulhi32(bits0, num_empty)``.

    floor(bits0 · n / 2³²) via 16-bit limbs — int32-only shifts/multiplies so
    the SAME expression runs in NumPy, XLA, and Mosaic (which lacks unsigned
    vector div/mod). Bias vs a true modulo is ≤ n/2³², i.e. negligible.
    """
    hi = (bits0 >> 16).astype(jnp.int32)
    lo = (bits0 & jnp.uint32(0xFFFF)).astype(jnp.int32)
    n = num_empty.astype(jnp.int32)
    return (hi * n + ((lo * n) >> 16)) >> 16


def spawn_tile(board_exp: Array, bits0: Array, bits1: Array) -> Array:
    """Place one new tile on a random empty cell.

    - cell: the ``spawn_rank(bits0, num_empty)``-th empty cell in row-major
      order (multiply-high uniform pick — see :func:`spawn_rank`)
    - exponent: 2 (tile 4) iff ``bits1 < FOUR_THRESHOLD`` else 1 (tile 2)
    - full board: unchanged (``core.py:229``)

    Fully branchless: rank-selection is a cumsum compare, placement a where.
    """
    flat = board_exp.reshape(*board_exp.shape[:-2], 16)
    empty = (flat == 0).astype(jnp.int32)
    num_empty = jnp.sum(empty, axis=-1)

    rank = spawn_rank(bits0, num_empty)
    # Position of the rank-th empty cell: first index where the running count
    # of empties exceeds `rank`.
    csum = jnp.cumsum(empty, axis=-1)
    target = (empty == 1) & (csum == rank[..., None] + 1)

    new_exp = jnp.where(bits1 < tfrng.FOUR_THRESHOLD, jnp.int32(2), jnp.int32(1))
    filled = jnp.where(target & (num_empty > 0)[..., None], new_exp[..., None], flat)
    return filled.reshape(board_exp.shape)


def next_state(
    board_exp: Array, action: Array, bits0: Array, bits1: Array
) -> tuple[Array, Array, Array]:
    """Full env transition: slide, then spawn iff the move changed the board.

    Mirrors ``gameboard.py:291-325``: an invalid action leaves the board
    untouched with reward 0 and consumes no spawn.

    Returns (new_board, reward float32, moved bool).
    """
    after, score = apply_action(board_exp, action)
    moved = jnp.any(after != board_exp, axis=(-1, -2))
    spawned = spawn_tile(after, bits0, bits1)
    new_board = jnp.where(moved[..., None, None], spawned, board_exp)
    reward = jnp.where(moved, score.astype(jnp.float32), 0.0)
    return new_board, reward, moved


def create_initial_board(game_seed: Array) -> Array:
    """Fresh board with two spawned tiles (spawn indices 0 and 1).

    ``game_seed`` is a uint32 scalar or batch; see ``ops/rng.py``.
    Mirrors ``core.py:325-343`` / ``twentyfortyeight.py:84``.
    """
    shape = jnp.shape(game_seed)
    board = jnp.zeros(shape + (BOARD_SIZE, BOARD_SIZE), dtype=jnp.int32)
    for i in (0, 1):
        b0, b1 = tfrng.spawn_bits(game_seed, jnp.full(shape, i, dtype=jnp.uint32))
        board = spawn_tile(board, b0, b1)
    return board


def afterstate_outcomes(board_exp: Array) -> tuple[Array, Array]:
    """Enumerate ALL spawn outcomes of an afterstate with probabilities.

    Device counterpart of the host engine's ``after_state``
    (``gameboard.py:132-171``): for each of the 16 cells × {2, 4} values,
    the successor board and its probability P(v)/num_empty (0 for occupied
    cells). A full board yields the input with probability 1 at slot 0.

    Returns (boards (…, 32, 4, 4), probs (…, 32)); slots are ordered
    cell-major ((cell 0, tile 2), (cell 0, tile 4), (cell 1, tile 2), …),
    matching the eager enumeration order of the reference.
    """
    flat = board_exp.reshape(*board_exp.shape[:-2], 16)
    empty = flat == 0
    num_empty = jnp.sum(empty.astype(jnp.int32), axis=-1)

    # (16 outcomes, 16 cells) placement mask, zeroed on occupied cells so the
    # zero-probability outcomes still carry valid (unchanged) boards.
    eye = jnp.eye(16, dtype=board_exp.dtype) * empty[..., None, :].astype(board_exp.dtype)
    boards2 = flat[..., None, :] + eye * 1  # exponent 1 = tile 2
    boards4 = flat[..., None, :] + eye * 2  # exponent 2 = tile 4
    boards = jnp.stack([boards2, boards4], axis=-2)  # (…, 16, 2, 16)
    boards = boards.reshape(*board_exp.shape[:-2], 32, 4, 4)

    p_cell = empty.astype(jnp.float32) / jnp.maximum(num_empty, 1)[..., None].astype(jnp.float32)
    probs = jnp.stack([p_cell * 0.9, p_cell * 0.1], axis=-1).reshape(*board_exp.shape[:-2], 32)

    # Full board: input board with probability 1 in slot 0.
    full = (num_empty == 0)[..., None]
    probs = jnp.where(full, jnp.zeros_like(probs).at[..., 0].set(1.0), probs)
    boards = jnp.where(
        full[..., None, None], board_exp[..., None, :, :], boards
    )
    return boards, probs


# ---------------------------------------------------------------------------
# Observation encoding & action sampling
# ---------------------------------------------------------------------------


def encode_observation(board_exp: Array) -> Array:
    """Flattened float obs in [0, 1]: exponent / 16 (``core.py:347-377``)."""
    return (board_exp.astype(jnp.float32) / float(MAX_EXPONENT)).reshape(
        *board_exp.shape[:-2], BOARD_SIZE * BOARD_SIZE
    )


@partial(jax.jit, static_argnums=(1,))
def sample_action(key: Array, temperature: float, policy: Array, legal_mask: Array) -> Array:
    """Sample an action from a policy restricted to legal moves.

    Same contract as the reference (``core.py:380-424``): mask, renormalize
    (uniform-over-legal fallback), temperature softmax in log space, greedy
    when ``temperature < 0.01``.
    """
    masked = jnp.where(legal_mask, policy, 0.0)
    total = jnp.sum(masked, axis=-1, keepdims=True)
    num_legal = jnp.sum(legal_mask.astype(jnp.float32), axis=-1, keepdims=True)
    uniform = legal_mask.astype(jnp.float32) / jnp.maximum(num_legal, 1.0)
    masked = jnp.where(total < 1e-8, uniform, masked / jnp.maximum(total, 1e-30))

    if temperature < 0.01:
        return jnp.argmax(masked, axis=-1)
    logits = jnp.log(masked + 1e-8) / temperature
    return jax.random.categorical(key, logits, axis=-1)
