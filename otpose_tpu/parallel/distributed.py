"""Multi-host (multi-process) SPMD support.

The reference is strictly single-process — its only scaling story is an
intra-process ``nn.DataParallel`` wrap (ref: train.py:78-79, eval.py:112-113)
and it has no multi-node code at all (SURVEY §2.5).  This module is the
TPU-native replacement for that ceiling: every host runs the same program,
``jax.distributed`` connects them, the ``Mesh`` spans all global devices,
each host's loader reads a disjoint row block of every global batch, and
``jax.make_array_from_process_local_data`` assembles the globally-sharded
batch.  XLA then emits the gradient all-reduce over ICI within a slice and
DCN across slices — no NCCL/MPI-style communication code exists anywhere.

Launch contract (one process per host):

- TPU pods: set ``OTPOSE_MULTIHOST=1`` (or ``cfg.TPU.MULTIHOST: true``) and
  let ``jax.distributed.initialize()`` auto-detect the pod topology.
- Anywhere else (including CPU integration tests, which use XLA's Gloo
  collectives): set ``OTPOSE_COORDINATOR=host:port``,
  ``OTPOSE_NUM_PROCESSES=N``, ``OTPOSE_PROCESS_ID=i``.

Division of labor once initialized:

- every process: device computation (jit steps over global arrays),
  checkpoint saves (orbax coordinates via the distributed client; the
  checkpoint dir must be a shared filesystem);
- primary only (``is_primary()``): tensorboard, visualization dumps,
  poseval json writing + AP computation — the resulting scalar is fanned
  back out with ``broadcast_scalar`` so control flow (best-checkpoint
  selection) stays identical on all processes.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize(cfg=None, env=os.environ) -> tuple[int, int]:
    """Connect this process to the job if a multi-process launch is
    configured; no-op (and cheap) for plain single-process runs.

    Must run before the first JAX backend use.  Returns
    ``(process_index, process_count)``.
    """
    global _INITIALIZED
    import jax

    coord = env.get("OTPOSE_COORDINATOR")
    flagged = env.get("OTPOSE_MULTIHOST", "") not in ("", "0", "false") or (
        cfg is not None and bool(getattr(cfg.TPU, "MULTIHOST", False)))
    if not _INITIALIZED:
        if coord:
            nproc = int(env["OTPOSE_NUM_PROCESSES"])
            pid = int(env["OTPOSE_PROCESS_ID"])
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=nproc, process_id=pid)
            _INITIALIZED = True
            logger.info("=> jax.distributed: process %d/%d via %s",
                        pid, nproc, coord)
        elif flagged:
            jax.distributed.initialize()  # TPU pod auto-detection
            _INITIALIZED = True
            logger.info("=> jax.distributed: process %d/%d (auto-detected)",
                        jax.process_index(), jax.process_count())
        elif cfg is None:
            # Decision deferred: the CLIs call once pre-config-parse and again
            # with the parsed cfg.  Touching jax.process_index() here would
            # initialize the XLA backend, and jax.distributed.initialize()
            # hard-raises after any backend init — so the cfg.TPU.MULTIHOST
            # launch path would crash on the second call.  Stay truly no-op.
            return 0, 1
    return jax.process_index(), jax.process_count()


def process_info() -> tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def local_row_block(global_batch: int) -> tuple[int, int]:
    """This process's contiguous ``[lo, hi)`` row block of a global batch.

    Contiguous blocks in process order match how ``P('data')`` lays rows on
    ``jax.devices()`` (which is process-major), so
    ``make_array_from_process_local_data`` accepts exactly these rows.
    """
    import jax

    count = jax.process_count()
    assert global_batch % count == 0, \
        f"global batch {global_batch} not divisible by {count} processes"
    per = global_batch // count
    lo = jax.process_index() * per
    return lo, lo + per


def fetch(x) -> np.ndarray:
    """Device array -> host numpy, multihost-safe.

    Single-process (or fully-addressable input): a plain copy.  Multihost
    with a sharded global array: every process holds only its shards, so a
    Gloo/ICI all-gather assembles the full value on every host (eval decode
    outputs are tiny — 17 keypoints per box)."""
    import jax

    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def barrier(name: str, timeout_s: int = 600) -> None:
    """Rendezvous all processes through the coordination service (plain RPC,
    no device collectives).  Use it to bound process skew before the first
    collective dispatch: XLA's CPU Gloo context init has a hardcoded ~30s
    rendezvous deadline, so a cold-compile skew between processes (one hits
    the persistent compile cache, another doesn't) kills the job unless the
    dispatch is fenced behind a compile-then-barrier sequence."""
    import jax

    if jax.process_count() == 1:
        return
    from jax._src.distributed import global_state

    global_state.client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)


def reached_preemption_sync_point(step_id: int) -> bool:
    """Multihost preemption agreement: True on EVERY process at the SAME
    ``step_id`` once any host received SIGTERM (XLA's preemption notifier
    owns the signal in multi-process jobs; jax.distributed.initialize sets
    it up).  This is the only sound way to stop a multi-process job early:
    host loops drift by the async dispatch depth, so a locally-observed flag
    would strand peers' in-flight collectives.  Call once per iteration with
    a monotonically increasing, process-consistent id.  False single-process
    (use engine/preempt.py's PreemptionGuard there)."""
    import jax

    if jax.process_count() == 1:
        return False
    from jax.experimental import multihost_utils

    return multihost_utils.reached_preemption_sync_point(step_id)


def broadcast_scalar(value: float | None, *, none_sentinel=np.nan) -> float | None:
    """Fan a primary-computed scalar (e.g. mean AP) out to every process so
    downstream control flow (best-checkpoint saves) stays in lockstep."""
    import jax

    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    v = none_sentinel if value is None else float(value)
    out = float(multihost_utils.broadcast_one_to_all(np.float32(v)))
    return None if np.isnan(out) else out
