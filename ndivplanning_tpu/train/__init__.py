"""Training: state, fused train step, host loop, evaluation (C8, C10-C13)."""

from ndivplanning_tpu.train.state import TrainState, create_train_state, build_models
from ndivplanning_tpu.train.step import train_step, train_step_fused

__all__ = [
    "TrainState",
    "create_train_state",
    "build_models",
    "train_step",
    "train_step_fused",
]
