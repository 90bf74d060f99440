"""Tracing / profiling hooks.

The reference's only observability is wall-clock AverageMeters printed as
``Speed {samples/s}`` (ref: script/Common.py:87-88,105,151-153,212-222).
Here: the same meters plus first-class ``jax.profiler`` trace capture
(cfg.TPU.PROFILE_DIR) and a step timer that understands asynchronous
dispatch (synchronizes via a scalar fetch, since device streams — and the
axon tunnel in this environment — complete asynchronously).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


_trace_active = [False]  # module-level: trace state survives across steps


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str], step: int = 0,
                first_step: int = 10, num_steps: int = 5):
    """Capture a jax.profiler trace for steps [first, first+num) when a
    profile dir is configured; no-op otherwise.

    Start/stop are paired via module state, not by step arithmetic alone:
    a run resuming from a checkpoint can enter the window mid-way (no
    start happened), and the stop fires on the last windowed step OR the
    first step past the window — whichever is seen — so a resumed or
    short run never calls stop_trace unmatched.
    """
    if not profile_dir:
        yield
        return
    in_window = first_step <= step < first_step + num_steps
    if in_window and not _trace_active[0]:
        jax.profiler.start_trace(profile_dir)
        _trace_active[0] = True
    try:
        yield
    finally:
        if _trace_active[0] and step >= first_step + num_steps - 1:
            jax.profiler.stop_trace()
            _trace_active[0] = False
            logger.info("profiler trace written to %s", profile_dir)


def synchronize(tree) -> None:
    """Force completion of all device work feeding `tree` by fetching one
    scalar to the host (block_until_ready alone is unreliable over the
    axon tunnel)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[0] if hasattr(leaves[0], "ravel")
                                  else leaves[0]))


class StepTimer:
    """Rolling step-time / throughput meter with async-aware syncing."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._t_last_sync = time.perf_counter()
        self._steps_since_sync = 0
        self.avg_step_time = float("nan")

    def step(self, output_tree=None) -> Optional[float]:
        """Call once per step; returns avg step time at sync points."""
        self._count += 1
        self._steps_since_sync += 1
        if self._count % self.sync_every == 0:
            if output_tree is not None:
                synchronize(output_tree)
            now = time.perf_counter()
            self.avg_step_time = (now - self._t_last_sync) / self._steps_since_sync
            self._t_last_sync = now
            self._steps_since_sync = 0
            return self.avg_step_time
        return None

    def throughput(self, batch_size: int) -> float:
        if not np.isfinite(self.avg_step_time) or self.avg_step_time <= 0:
            return float("nan")
        return batch_size / self.avg_step_time
