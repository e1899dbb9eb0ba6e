"""Flax models: trajectory generator, discriminator, condition encoders.

SURVEY.md §2 C1-C3 — pure ``apply`` functions; all randomness enters
through explicit PRNG keys (the bitwise-reproducibility discipline,
SURVEY.md §3.4).
"""

from ndivplanning_tpu.models.mlp import Generator, Discriminator
from ndivplanning_tpu.models.encoder import SceneEncoderCNN
from ndivplanning_tpu.models.conditioning import (
    ConditionEncoder,
    make_condition_encoder,
)

__all__ = [
    "Generator",
    "Discriminator",
    "SceneEncoderCNN",
    "ConditionEncoder",
    "make_condition_encoder",
]
