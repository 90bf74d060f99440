"""Tests for otpose_tpu/utils/profiling.py (trace pairing + step timer)."""

import os

import jax.numpy as jnp
import numpy as np

from otpose_tpu.utils import profiling
from otpose_tpu.utils.profiling import StepTimer, maybe_trace, synchronize


def test_maybe_trace_noop_without_dir():
    with maybe_trace("", step=10):
        pass
    assert not profiling._trace_active[0]


def test_maybe_trace_window_writes_trace(tmp_path):
    d = str(tmp_path / "prof")
    # steps 0..9 outside window, 10..14 inside, 15 past: exactly one
    # start/stop pair, trace files on disk afterwards
    for step in range(16):
        with maybe_trace(d, step=step, first_step=10, num_steps=5):
            jnp.zeros(4).block_until_ready()
        if step < 10:
            assert not profiling._trace_active[0]
    assert not profiling._trace_active[0]
    assert os.path.isdir(d)
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "profiler wrote no trace files"


def test_maybe_trace_resume_midwindow_pairs_stop(tmp_path):
    # a run resuming at step 12 (inside the window) must still pair the
    # stop with its own start and end cleanly
    d = str(tmp_path / "prof2")
    for step in (12, 13, 14, 15):
        with maybe_trace(d, step=step, first_step=10, num_steps=5):
            pass
    assert not profiling._trace_active[0]


def test_step_timer_sync_points():
    t = StepTimer(sync_every=3)
    out = jnp.ones((2, 2))
    results = [t.step(out) for _ in range(7)]
    # sync at steps 3 and 6 only
    assert results[2] is not None and results[5] is not None
    assert all(r is None for i, r in enumerate(results) if i not in (2, 5))
    assert t.avg_step_time > 0
    assert t.throughput(8) > 0
    fresh = StepTimer()
    assert np.isnan(fresh.throughput(8))


def test_synchronize_handles_scalars_and_empty():
    synchronize(jnp.float32(1.0))
    synchronize({"a": jnp.arange(3)})
    synchronize({})  # no leaves: no-op
