"""Multi-host (multi-process) SPMD support (parallel/distributed.py).

The reference has no multi-node story at all (SURVEY §2.5: a single-process
``nn.DataParallel`` wrap is its entire parallelism).  Here a 2-process CPU
job (XLA Gloo collectives) must reproduce the single-process numerics to
floating-point tolerance (cross-process collective reduction order differs
from the single-process all-reduce, so bit-exactness is not expected —
same bar as the 8-device data-parallel test in test_trainer.py): same
global batches, same mesh size, disjoint per-process row blocks assembled
with ``jax.make_array_from_process_local_data``.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers", "multihost_worker.py")


# ---------------------------------------------------------------- unit tier


def test_local_row_block_single_process():
    from otpose_tpu.parallel.distributed import local_row_block

    assert local_row_block(8) == (0, 8)


def test_broadcast_and_fetch_single_process():
    from otpose_tpu.parallel.distributed import broadcast_scalar, fetch

    assert broadcast_scalar(1.5) == 1.5
    assert broadcast_scalar(None) is None
    assert np.all(fetch(np.arange(3)) == np.arange(3))


def test_loader_process_sharding(tmp_path):
    """Two process-views of the same loader partition every batch exactly."""
    from otpose_tpu.data.loader import Loader

    class Idents:
        def __len__(self):
            return 17  # not divisible: drop_last trims the tail batch

        def get_sample_host(self, idx, rng=None, native_ok=True):
            return idx

    views = {}
    for pid in (0, 1):
        ld = Loader(Idents(), 4, shuffle=True, seed=3, drop_last=True,
                    num_workers=1, process_index=pid, process_count=2)
        ld.set_epoch(5)
        views[pid] = ld._index_batches()
    full = Loader(Idents(), 4, shuffle=True, seed=3, drop_last=True,
                  num_workers=1)
    full.set_epoch(5)
    full_batches = full._index_batches()

    assert len(views[0]) == len(views[1]) == len(full_batches) == 4
    for b0, b1, fb in zip(views[0], views[1], full_batches):
        np.testing.assert_array_equal(np.concatenate([b0, b1]), fb)

    # divisibility contract
    with pytest.raises(AssertionError):
        Loader(Idents(), 5, drop_last=True, process_index=0, process_count=2)
    with pytest.raises(AssertionError):
        Loader(Idents(), 4, drop_last=False, process_index=0, process_count=2)


def test_make_loader_passes_process_shard(monkeypatch):
    from otpose_tpu.config import get_cfg
    from otpose_tpu.data import make_loader
    import otpose_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "process_info", lambda: (1, 2))
    cfg = get_cfg()
    cfg.TPU.DEVICE_PREPROCESS = "off"

    class Ds:
        def __len__(self):
            return 8

    ld = make_loader(cfg, Ds(), 4, shuffle=False, drop_last=True,
                     process_shard=True)
    assert (ld.process_index, ld.process_count) == (1, 2)
    ld2 = make_loader(cfg, Ds(), 4, shuffle=False)  # eval: full batches
    assert (ld2.process_index, ld2.process_count) == (0, 1)


# -------------------------------------------------------- integration tier


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(out, extra_env, ckpt_dir=None):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update(OTPOSE_REPO=REPO, OTPOSE_LOCAL_DEVICES=extra_env.pop("_LOCAL"),
               **extra_env)
    if ckpt_dir:
        env["OTPOSE_CKPT_DIR"] = ckpt_dir
    return subprocess.Popen([sys.executable, WORKER, out], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


@pytest.mark.slow
def test_two_process_flagship_compile(tmp_path):
    """Flagship-spec (HRNet-W48, 5-dilation, full geometry) train step
    lowers + compiles for a 2-process 4-device mesh (compile-only: XLA
    CPU's collective rendezvous watchdog forbids flagship-scale execution
    on virtual devices — same rationale as __graft_entry__.py's flagship
    dryrun; VERDICT r2 task 4)."""
    port = _free_port()
    common = {"OTPOSE_COORDINATOR": f"127.0.0.1:{port}",
              "OTPOSE_NUM_PROCESSES": "2", "_LOCAL": "2",
              "OTPOSE_FLAGSHIP_COMPILE": "1"}
    p0 = _spawn("/dev/null", dict(common, OTPOSE_PROCESS_ID="0"))
    p1 = _spawn("/dev/null", dict(common, OTPOSE_PROCESS_ID="1"))
    logs = {}
    try:
        for name, p in (("p0", p0), ("p1", p1)):
            try:
                logs[name], _ = p.communicate(timeout=2400)
            except subprocess.TimeoutExpired:
                p.kill()
                raise
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
    assert p0.returncode == 0 and "FLAGSHIP_COMPILE_OK" in logs["p0"], \
        logs["p0"][-3000:]
    assert p1.returncode == 0 and "FLAGSHIP_COMPILE_OK" in logs["p1"], \
        logs["p1"][-3000:]


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    """2-process Gloo run == single-process run (atol 5e-6, the same bar
    as test_data_parallel_matches_single_device), including a multihost
    orbax checkpoint round-trip."""
    port = _free_port()
    ref_out = str(tmp_path / "ref.npz")
    mh_out = str(tmp_path / "mh.npz")
    ckpt_dir = str(tmp_path / "ck")

    def communicate(proc):
        # on timeout, reap the child — communicate() itself leaves it running
        try:
            out, _ = proc.communicate(timeout=1800)
            return out
        except subprocess.TimeoutExpired:
            proc.kill()
            raise

    ref = _spawn(ref_out, {"_LOCAL": "4"})
    ref_log = communicate(ref)
    assert ref.returncode == 0 and "WORKER_OK" in ref_log, ref_log[-3000:]

    common = {"OTPOSE_COORDINATOR": f"127.0.0.1:{port}",
              "OTPOSE_NUM_PROCESSES": "2", "_LOCAL": "2"}
    p0 = _spawn(mh_out, dict(common, OTPOSE_PROCESS_ID="0"), ckpt_dir)
    p1 = _spawn("/dev/null", dict(common, OTPOSE_PROCESS_ID="1",
                                  _LOCAL="2"), ckpt_dir)
    try:
        log0 = communicate(p0)
        log1 = communicate(p1)
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
    assert p0.returncode == 0 and "WORKER_OK" in log0, log0[-3000:]
    assert p1.returncode == 0 and "WORKER_OK" in log1, log1[-3000:]

    ref_blob = np.load(ref_out)
    mh_blob = np.load(mh_out)
    assert set(ref_blob.files) == set(mh_blob.files)
    # per-step losses and global gradient norms are the sharp correctness
    # signal: they pin the global-batch assembly, the loss, and the
    # cross-process gradient all-reduce
    np.testing.assert_allclose(ref_blob["losses"], mh_blob["losses"],
                               rtol=1e-6)
    # step 1: identical params + identical global batch => the all-reduced
    # grad norm is tight.  step 2's grads see the slightly-diverged params
    # (see below), so only a coarse bound applies there.
    np.testing.assert_allclose(ref_blob["grad_norms"][0],
                               mh_blob["grad_norms"][0], rtol=2e-5)
    np.testing.assert_allclose(ref_blob["grad_norms"][1],
                               mh_blob["grad_norms"][1], rtol=1e-3)
    # params after 2 AdamW steps: the normalized update m/(sqrt(v)+eps) has
    # ~unit magnitude regardless of gradient size, so reduction-order noise
    # (~1e-7 relative, Gloo tree vs single-process all-reduce) can flip the
    # full LR-sized update on near-zero-gradient leaves — compare at the
    # update scale (first-epoch warmup LR ~1e-5-scale updates => 1e-4 bound),
    # not at grad precision
    for k in ref_blob.files:
        if k in ("losses", "grad_norms"):
            continue  # asserted above at their own tolerances
        np.testing.assert_allclose(ref_blob[k], mh_blob[k], atol=1e-4,
                                   err_msg=k)


def test_maybe_initialize_is_noop_before_config():
    """The CLIs call maybe_initialize() BEFORE the cfg is parsed and again
    with the parsed cfg.  The first call must not touch the XLA backend:
    jax.distributed.initialize() hard-raises after any backend init, so a
    backend-initializing "no-op" would crash every cfg.TPU.MULTIHOST pod
    launch on the second call.  Run in a subprocess to control backend
    state."""
    code = """
import os
for k in ("OTPOSE_COORDINATOR", "OTPOSE_MULTIHOST"):
    os.environ.pop(k, None)
from otpose_tpu.parallel import distributed
pid, count = distributed.maybe_initialize()
assert (pid, count) == (0, 1), (pid, count)
from jax._src import xla_bridge
assert not xla_bridge.backends_are_initialized(), \\
    "maybe_initialize() without cfg/env initialized the XLA backend"
print("NOOP OK")
"""
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=120,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr
    assert "NOOP OK" in out.stdout
