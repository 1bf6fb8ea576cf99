"""Metrics / observability: TensorBoard writer + throughput counters + traces.

The reference logs ~20 scalar families and eval images to TensorBoard on host
0 (train_boxpose.py:447-528) plus wall-clock steps/rays-per-sec counters
(:518-522). Same surface here via tensorboardX, extended with the
ray-samples/sec north-star counter (BASELINE.md) and jax.profiler trace hooks
the reference lacks (SURVEY.md §5 'tracing: none').
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict

import jax
import numpy as np


class MetricsWriter:
    """TensorBoard scalars/images + a JSONL mirror for headless inspection."""

    def __init__(self, log_dir: str, enable_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if enable_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        clean = {k: float(np.asarray(v)) for k, v in values.items()}
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps({"step": step, **clean}) + "\n")
        self._jsonl.flush()

    def image(self, step: int, tag: str, image: np.ndarray) -> None:
        """image: [H, W, 3] float in [0, 1]."""
        if self._tb is not None:
            self._tb.add_image(tag, np.clip(image, 0, 1), step, dataformats="HWC")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class Throughput:
    """Steps/rays/ray-samples per second over print_every windows."""

    def __init__(self, batch_size: int, samples_per_ray: int):
        self.batch_size = batch_size
        self.samples_per_ray = samples_per_ray
        self.reset()

    def reset(self) -> None:
        self._t0 = time.time()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    def report(self) -> Dict[str, float]:
        dt = max(time.time() - self._t0, 1e-9)
        steps_per_sec = self._steps / dt
        rays_per_sec = steps_per_sec * self.batch_size
        out = {
            "perf/steps_per_sec": steps_per_sec,
            "perf/rays_per_sec": rays_per_sec,
            "perf/ray_samples_per_sec": rays_per_sec * self.samples_per_ray,
        }
        self.reset()
        return out


@contextlib.contextmanager
def trace(name: str, enabled: bool = True):
    """jax.profiler annotation for xprof traces (no-op when disabled)."""
    if enabled:
        with jax.profiler.TraceAnnotation(name):
            yield
    else:
        yield


def start_profiler(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()
