"""Sim-in-the-loop planning (SURVEY.md §3.3, L5)."""

from ndivplanning_tpu.planning.planner import PlanResult, plan

__all__ = ["PlanResult", "plan"]
