"""In-repo batched stochastic MCTS (decision/chance interleaved array tree)."""

from simulate_2048_tpu.search.mcts import (
    PolicyOutput,
    SearchConfig,
    batched_run_mcts,
    run_mcts,
)
from simulate_2048_tpu.search.policy import (
    batched_get_policy_target,
    batched_get_search_value,
    batched_select_action,
    get_policy_target,
    get_q_values,
    get_search_value,
    get_visit_counts,
    select_action,
    temperature_schedule,
)
from simulate_2048_tpu.search.tree import Tree

__all__ = [
    "PolicyOutput",
    "SearchConfig",
    "Tree",
    "batched_get_policy_target",
    "batched_get_search_value",
    "batched_run_mcts",
    "batched_select_action",
    "get_policy_target",
    "get_q_values",
    "get_search_value",
    "get_visit_counts",
    "run_mcts",
    "select_action",
    "temperature_schedule",
]
