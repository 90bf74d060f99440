"""Graceful-preemption handling for training.

The reference has no failure-recovery story beyond restart-and-auto-resume
from the last *epoch* checkpoint (ref: train.py:101-110, SURVEY §5), which
loses up to a full epoch of work.  TPU pods are routinely preempted
(maintenance events / spot reclaim send SIGTERM with a short grace window),
so training here is iteration-exact: the guard turns the first SIGTERM into
a request flag, the train loop stops at the next iteration boundary, the CLI
checkpoints the exact (epoch, iteration), and auto-resume skips straight to
that batch — bit-identical to the uninterrupted run because every RNG stream
(epoch shuffle, per-sample augmentation, per-step dropout) is index-keyed,
not sequence-keyed.
"""

from __future__ import annotations

import logging
import signal
from typing import Iterable

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Installs signal handlers that set a flag instead of killing the
    process; a second signal restores the previous disposition and re-raises
    (escape hatch if the graceful path wedges).

    Usage::

        guard = PreemptionGuard().install()
        ...
        train_epoch(..., should_stop=lambda: guard.requested)
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev = {}
        self.requested = False

    def install(self) -> "PreemptionGuard":
        for sig in self._signals:
            self._prev[sig] = signal.signal(sig, self._handle)
        return self

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()

    def _handle(self, signum, frame):
        if self.requested:
            # second signal: stop being graceful
            prev = self._prev.get(signum, signal.SIG_DFL)
            signal.signal(signum, prev)
            logger.warning("second signal %d: restoring default handling",
                           signum)
            signal.raise_signal(signum)
            return
        self.requested = True
        logger.warning("signal %d received: will checkpoint at the next "
                       "iteration boundary and exit", signum)

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    def check(self) -> bool:
        """Iteration-boundary probe (train_epoch ``should_stop``)."""
        return self.requested


class ClusterPreemptionGuard:
    """Multi-process preemption: agreement on a COMMON stop iteration.

    In a multi-process job the SIGTERM lands on one host, and host loops
    drift by the async dispatch depth — a locally-observed flag would make
    processes exit at different iterations, stranding peers' in-flight
    collectives (deadlock).  XLA's preemption notifier owns SIGTERM here
    (``jax.distributed.initialize`` registers it, replacing any Python
    handler), and ``check()`` runs the sync protocol: after a signal on any
    host, it returns True on every process at the same per-call counter
    value.  The counter starts at ``start_step`` — pass a process-consistent
    base (e.g. the resumed tensorboard step) so ids line up across restarts.
    """

    def __init__(self, start_step: int = 0):
        self._next_step = int(start_step)
        self.requested = False

    def install(self) -> "ClusterPreemptionGuard":
        return self  # nothing to install: the XLA notifier already owns SIGTERM

    def check(self) -> bool:
        from otpose_tpu.parallel.distributed import reached_preemption_sync_point

        if not self.requested:
            step, self._next_step = self._next_step, self._next_step + 1
            if reached_preemption_sync_point(step):
                self.requested = True
                logger.warning("cluster preemption: all processes stopping "
                               "at sync step %d", step)
        return self.requested


def make_preemption_guard(start_step: int = 0):
    """The right guard for the process topology: PreemptionGuard (Python
    SIGTERM flag) single-process, ClusterPreemptionGuard (coordination-
    service sync protocol) in multi-process jobs."""
    import jax

    if jax.process_count() > 1:
        return ClusterPreemptionGuard(start_step).install()
    return PreemptionGuard().install()
