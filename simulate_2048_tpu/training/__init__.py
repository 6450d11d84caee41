"""Training stack: config, losses, replay, self-play, learner, checkpoint, trainer."""

from simulate_2048_tpu.training.checkpoint import CheckpointManager
from simulate_2048_tpu.training.config import TrainConfig, default_config, small_config, tiny_config
from simulate_2048_tpu.training.learner import (
    TrainState,
    create_optimizer,
    create_train_state,
    train_step,
)
from simulate_2048_tpu.training.losses import (
    LossOutput,
    TrainingTargets,
    compute_loss,
    inverse_scale_value,
    scale_value,
)
from simulate_2048_tpu.training.reanalyze import reanalyze_pass, reanalyze_slots
from simulate_2048_tpu.training.replay import (
    BufferState,
    Trajectory,
    add_trajectories,
    init_buffer,
    sample_batch,
    update_priorities,
)
from simulate_2048_tpu.training.self_play import (
    compute_n_step_returns,
    evaluate_games,
    generate_games,
    play_games,
)
from simulate_2048_tpu.training.trainer import Trainer, train_muzero

__all__ = [
    "BufferState",
    "CheckpointManager",
    "LossOutput",
    "TrainConfig",
    "TrainState",
    "Trainer",
    "TrainingTargets",
    "Trajectory",
    "add_trajectories",
    "compute_loss",
    "compute_n_step_returns",
    "create_optimizer",
    "create_train_state",
    "default_config",
    "evaluate_games",
    "generate_games",
    "init_buffer",
    "inverse_scale_value",
    "play_games",
    "reanalyze_pass",
    "reanalyze_slots",
    "sample_batch",
    "scale_value",
    "small_config",
    "tiny_config",
    "train_muzero",
    "train_step",
    "update_priorities",
]
