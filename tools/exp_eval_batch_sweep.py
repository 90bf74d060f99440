"""Eval-forward batch sweep with the CURRENT fast path, same-process
interleaved (cross-process comparisons drift 3-5% over the axon tunnel).

The round-2 sweep (b16/b24/b32 = 102.1/90.4/98.2 clips/s, STATUS.md) predates
the fused Pallas kernels and the final-layer/upsample commute, so the batch
sweet spot may have moved.  ``bench.py`` defaults BENCH_BATCH=16 off that old
receipt — this re-measures it.

Usage: python tools/exp_eval_batch_sweep.py [--batches 16,24,32] [--iters 12]
                                            [--rounds 3]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,24,32")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from otpose_tpu.utils.backend import ensure_live_backend

    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from bench import _build

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    fn, params, state = _build(dtype)

    def fetch(out):
        return float(np.asarray(out[:1, :1, :1, :1]).ravel()[0])

    data = {}
    for b in batches:
        x = jnp.asarray(np.random.RandomState(0).randn(b, 384, 288, 15),
                        jnp.float32)
        margin = jnp.ones((b, 4), jnp.float32)
        data[b] = (x, margin)
        fetch(fn(params, state, x, margin))  # compile
        print(f"compiled b{b}", flush=True)

    results = {b: [] for b in batches}
    for r in range(args.rounds):
        for b in batches:
            x, margin = data[b]
            fetch(fn(params, state, x, margin))  # warm
            t0 = time.perf_counter()
            outs = [fn(params, state, x, margin) for _ in range(args.iters)]
            fetch(outs[-1])
            dt = time.perf_counter() - t0
            clips = b * args.iters / dt
            results[b].append(clips)
            print(f"round {r} b{b}: {clips:.1f} clips/s "
                  f"({1e3 * dt / args.iters:.1f} ms/it)", flush=True)

    for b in batches:
        v = results[b]
        print(f"b{b}: {min(v):.1f}-{max(v):.1f} clips/s "
              f"(mean {sum(v) / len(v):.1f})", flush=True)


if __name__ == "__main__":
    main()
