"""Bounded TPU liveness probe: one tiny jitted fetch, hard deadline.

Usage: python tools/probe_chip.py [deadline_s=240]

Exits 0 and prints ``CHIP OK backend=... dt=...s`` if the first device op
completes within the deadline; exits 3 with ``CHIP WEDGED`` otherwise
(a daemon-timer hard-exit — a wedged axon chip hangs the fetch forever and
Python-level interrupts never fire, same rationale as bench.py's watchdog).

Run this BEFORE any flagship TPU job when the chip's state is uncertain
(e.g. after a timed-out client).  A wedged chip shows: relay ports
8082/8092 open, backend init prints the axon warning, then the first fetch
hangs.  It revives on its own after minutes of NO connection attempts —
each abandoned client appears to queue another dead session, so back off
instead of hammering, and leave >=1-2 min between a client exiting and the
next one starting.
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import threading
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main() -> None:
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0

    def _bail() -> None:
        print(f"CHIP WEDGED: tiny fetch did not complete in {deadline:.0f}s",
              flush=True)
        os._exit(3)

    timer = threading.Timer(deadline, _bail)
    timer.daemon = True
    timer.start()

    from otpose_tpu.utils.backend import ensure_live_backend
    ensure_live_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(8.0))
    v = float(np.asarray(x.ravel()[0]))
    assert v == 1.0, v
    print(f"CHIP OK backend={jax.default_backend()} dt={time.time() - t0:.1f}s",
          flush=True)
    timer.cancel()


if __name__ == "__main__":
    main()
