"""Observability (SURVEY.md §2.15, §5.5): scalar curves + stdout one-liner.

Surface parity with the reference's tensorboardX SummaryWriter usage
([R trainer.py]): `writer.scalar(tag, value, step)`. Backends:
  * TensorBoard via torch.utils.tensorboard when importable (the sandbox
    ships torch-cpu);
  * always: an append-only `scalars.jsonl` (one {"step","tag","value"} per
    line) — grep-able, survives without TF, and is what the bench harness
    reads back.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"step": int(step), "tag": tag, "value": float(value),
             "ts": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def scalars(self, metrics: dict, step: int) -> None:
        for k, v in metrics.items():
            self.scalar(k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullWriter:
    """MetricWriter-shaped no-op for non-leader processes in multi-host
    runs: every process computes the (pmean'd, identical) metrics, only
    process 0 writes files — N processes appending to one scalars.jsonl /
    TB event file on a shared out_dir would interleave/corrupt."""

    def scalar(self, tag: str, value: float, step: int) -> None:
        pass

    def scalars(self, metrics: dict, step: int) -> None:
        pass

    def close(self) -> None:
        pass


def step_line(step: int, metrics: dict, steps_per_sec: Optional[float] = None
              ) -> str:
    """The reference's per-step stdout one-liner."""
    parts = [f"step {step}"]
    parts += [f"{k} {float(v):.4f}" for k, v in sorted(metrics.items())]
    if steps_per_sec is not None:
        parts.append(f"steps/s {steps_per_sec:.3f}")
    return " | ".join(parts)
