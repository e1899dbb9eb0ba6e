"""Structured metrics logging (SURVEY.md §5 metrics/observability).

A small JSONL writer: one line per log event, host-side, fed from a single
device-to-host transfer per log interval.  The three contract metrics
(BASELINE.json:2 — train steps/sec/chip, NDiv pairs/sec, rollout
steps/sec) are emitted by bench.py in the same row format.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Mapping


class MetricsWriter:
    """Append-only JSONL metrics stream + optional console echo +
    optional TensorBoard summaries (``tensorboard=True``; uses
    ``flax.metrics.tensorboard``, imported lazily)."""

    def __init__(self, workdir: str | None = None, echo: bool = True,
                 filename: str = "metrics.jsonl", tensorboard: bool = False):
        self._echo = echo
        self._fh: IO[str] | None = None
        self._tb = None
        # "" and None both mean no persistence (train(workdir="")).
        if workdir:
            os.makedirs(workdir, exist_ok=True)
            self._fh = open(os.path.join(workdir, filename), "a")
            if tensorboard:
                from flax.metrics import tensorboard as tb

                self._tb = tb.SummaryWriter(os.path.join(workdir, "tb"))
        self._t0 = time.monotonic()

    def write(self, step: int, scalars: Mapping[str, float], **extra) -> None:
        row = {
            "step": int(step),
            "wall_s": round(time.monotonic() - self._t0, 3),
            **{k: float(v) for k, v in scalars.items()},
            **extra,
        }
        if self._fh is not None:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, float(v), step)
        if self._echo:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items() if k != "wall_s"
            )
            print(f"[metrics] {parts}", file=sys.stderr)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
