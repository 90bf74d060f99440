"""A/B: HRNet forward in train mode (BN batch stats, f32 stat math) vs eval
mode (compute-dtype affine from running stats) — bounds the train step's
BN batch-statistics cost empirically (VERDICT r4 task 2 candidate bucket).

HRNet has no dropout, so train-vs-eval forward delta on the backbone IS the
batch-stat cost for the step's dominant subtree (~100 BN layers).  Same
process, interleaved rounds (tunnel drift — CLAUDE.md).

Usage: python tools/exp_bn_train_cost.py [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from otpose_tpu.utils.backend import ensure_live_backend

    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.hrnet import hrnet_forward
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    # train step sees the 5-frame window as one 5B image batch
    x = jnp.asarray(np.random.RandomState(0).randn(5 * args.batch, 384, 288, 3),
                    dt)

    def f_train(params, state, x):
        ctx = Ctx(params, state, train=True, rng=jax.random.PRNGKey(1),
                  compute_dtype=dt)
        out = hrnet_forward(ctx.sub("rough_pose_estimation_net"), x,
                            spec.hrnet)
        # carry the updated running stats so the stat computation cannot be
        # dead-code eliminated
        return out, ctx.new_state

    def f_eval(params, state, x):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return hrnet_forward(ctx.sub("rough_pose_estimation_net"), x,
                             spec.hrnet)

    jt = jax.jit(f_train)
    je = jax.jit(f_eval)

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jax.device_get(leaf.ravel()[0])))

    t0 = time.perf_counter()
    fence(jt(params, state, x))
    print(f"train-mode compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    fence(je(params, state, x))
    print(f"eval-mode compile {time.perf_counter() - t0:.1f}s", flush=True)

    for rnd in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = jt(params, state, x)
        fence(out)
        ms_t = (time.perf_counter() - t0) / args.iters * 1e3
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = je(params, state, x)
        fence(out)
        ms_e = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"round {rnd}: hrnet train {ms_t:.1f} ms  eval {ms_e:.1f} ms  "
              f"BN batch-stat cost {ms_t - ms_e:+.1f} ms", flush=True)


if __name__ == "__main__":
    main()
