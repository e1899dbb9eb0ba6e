"""Sim-in-the-loop planning (SURVEY.md §3.3, L5)."""

from ndivplanning_tpu.planning.cem import plan_cem, plan_cem_batch
from ndivplanning_tpu.planning.client import PlanningClient, ServerError
from ndivplanning_tpu.planning.grad_refine import (
    SoftWeights,
    plan_grad,
    plan_grad_batch,
)
from ndivplanning_tpu.planning.mpc import MPCResult, mpc_rollout
from ndivplanning_tpu.planning.planner import PlanResult, plan, plan_batch

__all__ = ["MPCResult", "mpc_rollout", "PlanResult", "plan", "plan_batch",
           "plan_cem", "plan_cem_batch", "plan_grad", "plan_grad_batch",
           "PlanningClient", "ServerError", "SoftWeights"]
