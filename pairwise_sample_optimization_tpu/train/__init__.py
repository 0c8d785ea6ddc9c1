from .sampling import sample_turbo_trajectories, sample_dmd_trajectories, Trajectory
from .losses import (
    sample_compare,
    pareto_compare,
    pso_pairwise_loss,
    dreambooth_pso_loss,
)
from .train_state import PSOTrainState, make_optimizer, make_lr_schedule
from .online_pso import OnlinePSOConfig, OnlinePSOTrainer
from .dreambooth_pso import DreamBoothPSOConfig, DreamBoothPSOTrainer
from .quantized_adam import adam8bit
from .prodigy import prodigy, ProdigyState

__all__ = [
    "sample_turbo_trajectories",
    "sample_dmd_trajectories",
    "Trajectory",
    "sample_compare",
    "pareto_compare",
    "pso_pairwise_loss",
    "dreambooth_pso_loss",
    "PSOTrainState",
    "make_optimizer",
    "make_lr_schedule",
    "OnlinePSOConfig",
    "OnlinePSOTrainer",
    "DreamBoothPSOConfig",
    "DreamBoothPSOTrainer",
    "adam8bit",
    "prodigy",
    "ProdigyState",
]
