"""Functional JAX environment: GameState pytree, reset/step, batched + on-device rollouts."""

from simulate_2048_tpu.env.env import (
    Environment,
    GameState,
    batched_get_legal_actions,
    batched_get_observation,
    batched_reset,
    batched_step,
    get_legal_actions,
    get_observation,
    reset,
    reset_batch,
    step,
    step_auto_reset,
)

__all__ = [
    "Environment",
    "GameState",
    "batched_get_legal_actions",
    "batched_get_observation",
    "batched_reset",
    "batched_step",
    "get_legal_actions",
    "get_observation",
    "reset",
    "reset_batch",
    "step",
    "step_auto_reset",
]
