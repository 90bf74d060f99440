"""Preemption-safe training: guard semantics + iteration-exact resume.

The reference's only recovery is restart-from-last-epoch-checkpoint
(ref: train.py:101-110); here a SIGTERM checkpoints the exact (epoch,
iteration) and resume reproduces the uninterrupted run bit-for-bit because
every RNG stream (epoch shuffle, per-sample augmentation, per-step dropout)
is index-keyed.
"""

import os
import signal

import jax
import numpy as np
import pytest

from otpose_tpu.engine import checkpoints as ckpt
from otpose_tpu.engine.optim import make_optimizer, make_schedule
from otpose_tpu.engine.preempt import PreemptionGuard
from otpose_tpu.engine.runner import train_epoch
from otpose_tpu.engine.trainer import init_train_state, make_train_step
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.utils.testing import tiny_otpose_cfg

from tests.helpers.synthetic_data import make_synthetic_posetrack

pytest.importorskip("cv2")


def test_guard_flag_and_restore():
    guard = PreemptionGuard((signal.SIGUSR1,)).install()
    try:
        assert not guard.requested
        signal.raise_signal(signal.SIGUSR1)
        assert guard.requested
    finally:
        guard.uninstall()
    # disposition restored: a handler we set afterwards sees the signal
    hits = []
    prev = signal.signal(signal.SIGUSR1, lambda *_: hits.append(1))
    try:
        signal.raise_signal(signal.SIGUSR1)
        assert hits == [1]
    finally:
        signal.signal(signal.SIGUSR1, prev)


def test_guard_context_manager():
    with PreemptionGuard((signal.SIGUSR2,)) as guard:
        assert not guard.requested
        signal.raise_signal(signal.SIGUSR2)
        assert guard.requested


def test_guard_check_mirrors_requested():
    guard = PreemptionGuard((signal.SIGUSR1,)).install()
    try:
        assert guard.check() is False
        signal.raise_signal(signal.SIGUSR1)
        assert guard.check() is True
    finally:
        guard.uninstall()


def test_make_preemption_guard_single_process():
    """Single-process: the Python-signal guard; the cluster guard's sync
    protocol is only reachable in multi-process jobs (integration-tested by
    tests/test_distributed.py via the worker's preempt phase)."""
    from otpose_tpu.engine.preempt import (ClusterPreemptionGuard,
                                           make_preemption_guard)

    guard = make_preemption_guard(start_step=7)
    assert isinstance(guard, PreemptionGuard)
    guard.uninstall()
    # the cluster guard is inert single-process: check() never fires
    cg = ClusterPreemptionGuard(start_step=7)
    assert cg.check() is False and cg.check() is False
    assert cg._next_step == 9 and not cg.requested


@pytest.fixture(scope="module")
def train_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt")
    json_dir, img_dir, _ = make_synthetic_posetrack(
        str(root), num_videos=1, frames_per_video=4, people_per_frame=2,
        img_w=96, img_h=96)
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.COLOR_RGB = True
    cfg.TRAIN.PROB_HALF_BODY = 0.0
    cfg.PRINT_FREQ = 100
    cfg.TPU.COMPUTE_DTYPE = "float32"

    from otpose_tpu.data.posetrack import PoseTrackDataset

    ds = PoseTrackDataset(cfg, "train")
    spec = OTPoseSpec.from_cfg(cfg)
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    schedule = make_schedule(cfg, 4)
    optimizer = make_optimizer(params, cfg, schedule)
    step_fn = make_train_step(spec, optimizer, donate=False)

    def fresh_state():
        return init_train_state(params, model_state, optimizer)

    def fresh_loader(seed=123):
        from otpose_tpu.data.loader import Loader

        return Loader(ds, 2, shuffle=True, num_workers=2, seed=seed,
                      drop_last=True)

    return cfg, step_fn, fresh_state, fresh_loader


def _leaves(ts):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(ts.params)]


@pytest.mark.slow
def test_iteration_exact_resume(train_setup, tmp_path):
    cfg, step_fn, fresh_state, fresh_loader = train_setup
    rng = jax.random.PRNGKey(7)

    # ---- run A: 2 uninterrupted epochs
    ts_a, tb = fresh_state(), 0
    loader = fresh_loader()
    for epoch in range(2):
        loader.set_epoch(epoch)
        ts_a, tb, done = train_epoch(step_fn, ts_a, loader, epoch, cfg,
                                     rng=jax.random.fold_in(rng, epoch),
                                     global_steps=tb)
        assert done == len(loader) == 4

    # ---- run B: preempt after 2 iterations of epoch 0, checkpoint, resume
    ts_b, tb_b = fresh_state(), 0
    loader = fresh_loader()
    loader.set_epoch(0)
    calls = []

    def stop_after_two():
        calls.append(1)
        return len(calls) >= 2

    ts_b, tb_b, done = train_epoch(step_fn, ts_b, loader, 0, cfg,
                                   rng=jax.random.fold_in(rng, 0),
                                   global_steps=tb_b,
                                   should_stop=stop_after_two)
    assert done == 2 and tb_b == 2
    folder = str(tmp_path / "ck")
    ckpt.save_checkpoint(folder, 0, ts_b, tensorboard_global_steps=tb_b,
                         iteration=done)

    # "new process": fresh state, fresh loader, auto-resume
    ts_c, begin_epoch, tb_c, start_it = ckpt.resume(folder, fresh_state())
    assert begin_epoch == 0 and start_it == 2 and tb_c == 2
    loader = fresh_loader()
    for epoch in range(begin_epoch, 2):
        loader.set_epoch(epoch)
        ts_c, tb_c, done = train_epoch(
            step_fn, ts_c, loader, epoch, cfg,
            rng=jax.random.fold_in(rng, epoch), global_steps=tb_c,
            start_iteration=start_it if epoch == begin_epoch else 0)
    assert tb_c == tb == 8

    for a, c in zip(_leaves(ts_a), _leaves(ts_c)):
        np.testing.assert_array_equal(a, c)


def test_loader_start_iteration_matches_tail(train_setup):
    """Skipping k batches yields exactly the tail of the full pass."""
    _, _, _, fresh_loader = train_setup
    loader = fresh_loader(seed=9)
    loader.set_epoch(3)
    full = [b["inputs"] for b, _ in loader]
    loader.set_epoch(3)
    loader.set_start_iteration(2)
    tail = [b["inputs"] for b, _ in loader]
    assert len(tail) == len(full) - 2
    for x, y in zip(full[2:], tail):
        np.testing.assert_array_equal(x, y)
    # one-shot: the next pass is full again
    loader.set_epoch(3)
    assert len([1 for _ in loader]) == len(full)
