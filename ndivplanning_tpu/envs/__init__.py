"""Pure-functional planning environments (SURVEY.md §2 C6/C7, §3.3).

The reference's Python ``Env`` with a scene/state API and a per-step Python
loop becomes a pure-functional ``step(params, scene, state, action) ->
(state, info)`` rolled out with ``lax.scan`` and batched with ``vmap`` so
sim-in-the-loop candidate scoring runs entirely on TPU.
"""

from ndivplanning_tpu.envs.types import EnvParams, EnvState, Scene, StepInfo
from ndivplanning_tpu.envs.pointmass import reset, step
from ndivplanning_tpu.envs.registry import EnvAPI, get_env
from ndivplanning_tpu.envs.rollout import (
    rollout,
    rollout_actions,
    rollout_waypoints,
    score_candidates,
)
from ndivplanning_tpu.envs.arm3 import Arm3Params, Arm3State
from ndivplanning_tpu.envs.quadrotor import QuadrotorParams, QuadrotorState
from ndivplanning_tpu.envs.reacher import ReacherParams, ReacherState
from ndivplanning_tpu.envs.unicycle import UnicycleParams, UnicycleState

__all__ = [
    "Arm3Params",
    "Arm3State",
    "EnvAPI",
    "EnvParams",
    "EnvState",
    "QuadrotorParams",
    "QuadrotorState",
    "ReacherParams",
    "ReacherState",
    "Scene",
    "StepInfo",
    "UnicycleParams",
    "UnicycleState",
    "get_env",
    "reset",
    "step",
    "rollout",
    "rollout_actions",
    "rollout_waypoints",
    "score_candidates",
]
