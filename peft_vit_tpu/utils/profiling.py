"""Profiling / tracing utilities (SURVEY §5 'Tracing / profiling').

Reference analogs:
* tensorboardX scalars + AverageMeter timing (lib/core/function.py:149-170)
  -> ``MetricsWriter`` (JSONL + optional TensorBoard via flax.metrics) and
  ``StepTimer``.
* tensorwatch/ptflops model stats -> utils/summary.py (XLA cost analysis).
* ``torch.autograd.set_detect_anomaly`` (TRAIN.DETECT_ANOMALY,
  tools/train.py:159) -> ``enable_anomaly_detection`` = jax debug_nans.
* ``jax.profiler`` traces for xprof/tensorboard (TPU equivalent of the
  CUDA profiler hooks).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


def enable_anomaly_detection(enabled: bool = True) -> None:
    """NaN-producing op raises immediately (debug mode; slows execution)."""
    jax.config.update("jax_debug_nans", enabled)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter with a *host-fetch* sync (block_until_ready is not
    reliable on every PJRT plugin — see bench.py)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._samples = 0
        self._steps = 0

    def step(self, batch_size: int, sync_value=None):
        if sync_value is not None:
            float(np.asarray(sync_value).ravel()[0])
        self._samples += batch_size
        self._steps += 1

    @property
    def samples_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._samples / max(dt, 1e-9)

    @property
    def ms_per_step(self) -> float:
        dt = time.perf_counter() - self._t0
        return 1000.0 * dt / max(self._steps, 1)


class MetricsWriter:
    """Structured scalar log: JSONL always; TensorBoard when available."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:  # pragma: no cover - optional dep
            from flax.metrics import tensorboard

            self._tb = tensorboard.SummaryWriter(log_dir)
        except Exception:
            pass

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.scalar(k, float(v), step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
