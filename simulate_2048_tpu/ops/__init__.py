"""TPU compute path: board kernels, counter-based RNG, rollout drivers."""

from simulate_2048_tpu.ops.board import (
    BOARD_SIZE,
    NUM_ACTIONS,
    afterstate_outcomes,
    apply_action,
    count_empty,
    create_initial_board,
    encode_observation,
    exponents_to_values,
    is_done,
    legal_actions_mask,
    max_tile,
    next_state,
    sample_action,
    slide_and_merge,
    spawn_tile,
    values_to_exponents,
)
from simulate_2048_tpu.ops.rng import (
    FOUR_THRESHOLD,
    derive_game_seeds,
    spawn_bits,
    threefry2x32,
)

__all__ = [
    "BOARD_SIZE",
    "afterstate_outcomes",
    "NUM_ACTIONS",
    "FOUR_THRESHOLD",
    "apply_action",
    "count_empty",
    "create_initial_board",
    "derive_game_seeds",
    "encode_observation",
    "exponents_to_values",
    "is_done",
    "legal_actions_mask",
    "max_tile",
    "next_state",
    "sample_action",
    "slide_and_merge",
    "spawn_bits",
    "spawn_tile",
    "threefry2x32",
    "values_to_exponents",
]
