"""The six Stochastic MuZero networks (Flax Linen) and their bundle."""

from simulate_2048_tpu.models.blocks import DenseResidualBlock, ResidualTower
from simulate_2048_tpu.models.muzero import (
    AfterstateDynamics,
    AfterstatePrediction,
    Dynamics,
    Encoder,
    Prediction,
    Representation,
)
from simulate_2048_tpu.models.network import (
    MuZeroNetwork,
    NetworkApplyFns,
    NetworkParams,
    count_parameters,
    create_network,
    update_params,
)

__all__ = [
    "AfterstateDynamics",
    "AfterstatePrediction",
    "DenseResidualBlock",
    "Dynamics",
    "Encoder",
    "MuZeroNetwork",
    "NetworkApplyFns",
    "NetworkParams",
    "Prediction",
    "Representation",
    "ResidualTower",
    "count_parameters",
    "create_network",
    "update_params",
]
