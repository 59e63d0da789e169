"""Profiling + determinism utilities (SURVEY.md §5 tracing row).

The reference logs wall-clock forward/backward ms per step (AbDock
train.py:97-126) and seeds all RNGs (misc.py:70-75). TPU-native equivalents:
``jax.profiler`` traces viewable in TensorBoard/XProf, a lightweight step
timer, and host-RNG seeding (device RNG is explicit-key, deterministic by
construction).
"""
from __future__ import annotations

import contextlib
import logging
import random
import time
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def seed_all(seed: int):
    """Seed the host RNGs (device randomness is key-threaded already)."""
    random.seed(seed)
    np.random.seed(seed)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with xprof/TB)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info('profiler trace written to %s', log_dir)


class StepTimer:
    """Rolling per-step wall-clock timer (blocks on device completion when
    given an output to block on)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, block_on=None) -> float:
        if block_on is not None:
            import jax
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean_ms(self) -> float:
        return 1e3 * (sum(self.times) / len(self.times)) if self.times else 0.0
