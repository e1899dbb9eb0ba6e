"""Synthetic tasks & scene generation (SURVEY.md §2 C9, L6)."""

from ndivplanning_tpu.data.tasks import Batch, make_task, Task

__all__ = ["Batch", "make_task", "Task"]
