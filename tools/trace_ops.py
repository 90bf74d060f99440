"""Capture a jax.profiler trace of one model stage and print top XLA ops.

Parses the xplane.pb produced by jax.profiler.trace directly (no TensorBoard
UI needed) and aggregates device-op durations by a fusion-name heuristic, so
perf work can target the real buckets (VERDICT r1 task 3).

Usage: python tools/trace_ops.py [--stage hrnet_5b|full_forward|temporal] [--batch 16]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def parse_xplane(path: str):
    from tools.xplane import device_op_totals, iter_planes

    agg = device_op_totals(path)
    if not agg:
        # fall back: dump plane/line names to debug what the runtime recorded
        for name, lines, _meta in iter_planes(path):
            print("plane:", name, "lines:", [ln for ln, _ in lines][:8])
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="hrnet_5b")
    ap.add_argument("--batch", type=int, default=None,
                    help="default 16, except train_step which defaults to 8 "
                         "(flagship train without remat only fits 16GB HBM "
                         "at per-chip batch <= 8)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 8 if args.stage == "train_step" else 16

    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.hrnet import hrnet_forward
    from otpose_tpu.models.conv_transformer import conv_transformer_forward
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose, otpose_forward
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    b = args.batch
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)

    if args.stage == "hrnet_5b":
        x = jnp.asarray(rng.randn(5 * b, 384, 288, 3), dt)

        def f(params, state, x):
            ctx = Ctx(params, state, train=False, compute_dtype=dt)
            return hrnet_forward(ctx.sub("rough_pose_estimation_net"), x, spec.hrnet)

        fn, fargs = jax.jit(f), (params, state, x)
    elif args.stage == "temporal":
        x = jnp.asarray(rng.randn(b, spec.pe_h, spec.pe_w,
                                  spec.temporal_encoding_dim), dt)

        def f(params, state, x):
            ctx = Ctx(params, state, train=False, compute_dtype=dt)
            return conv_transformer_forward(ctx.sub("temporal_encoder1"), x,
                                            spec.temporal_spec())[0]

        fn, fargs = jax.jit(f), (params, state, x)
    elif args.stage == "train_step":
        # full train step (fwd+bwd+AdamW, shipped no-remat default) so the
        # backward-pass buckets are visible — batch 8 matches the
        # time_train_step.py number of record
        from otpose_tpu.engine.optim import make_optimizer, make_schedule
        from otpose_tpu.engine.trainer import (TrainState, make_train_step)
        from otpose_tpu.utils.testing import flagship_otpose_cfg as _cfg

        cfg = _cfg()
        opt = make_optimizer(params, cfg, make_schedule(cfg, 1000))
        # donate=True to match the shipped trainer + time_train_step.py
        # exactly: donate=False adds a full params/opt-state copy per step
        # and pushed buffers into alternate memory space in a round-3 trace
        # (2266 ms/iter traced vs 394 measured) — trace the real program.
        step = make_train_step(spec, opt, compute_dtype=dt, remat=False,
                               donate=True)
        batch = {
            "inputs": jnp.asarray(rng.randn(b, 384, 288, 15), jnp.float32),
            "margin": jnp.ones((b, 4), jnp.float32),
            "target": jnp.asarray(rng.rand(b, 96, 72, 17), jnp.float32),
            "target_weight": jnp.ones((b, 17, 1), jnp.float32),
        }
        ts = TrainState(params, state, opt.init(params), jnp.zeros([], jnp.int32))
        key = jax.random.PRNGKey(1)

        class _Stateful:
            """Thread the donated TrainState across iterations; expose the
            same fn(*fargs) surface the other stages use."""

            def __init__(self, ts0):
                self.ts = ts0

            def __call__(self):
                self.ts, metrics = step(self.ts, batch, key)
                return metrics["final_loss"]

        fn, fargs = _Stateful(ts), ()
    else:
        x = jnp.asarray(rng.randn(b, 384, 288, 15), jnp.float32)
        margin = jnp.ones((b, 4), jnp.float32)

        def f(params, state, x, margin):
            ctx = Ctx(params, state, train=False, compute_dtype=dt)
            return otpose_forward(ctx, x, margin, spec)[0]

        fn, fargs = jax.jit(f), (params, state, x, margin)

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jax.device_get(leaf.ravel()[0])))

    fence(fn(*fargs))
    fence(fn(*fargs))

    tmp = tempfile.mkdtemp(prefix="trace_")
    with jax.profiler.trace(tmp):
        out = None
        for _ in range(args.iters):
            out = fn(*fargs)
        fence(out)

    paths = glob.glob(osp.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("NO XPLANE CAPTURED under", tmp)
        return

    # per-step budget: Steps-line wall, per-hlo_category op time + XLA's
    # per-op flops, async DMA reported separately (it OVERLAPS compute —
    # summing it into the total read 2326 "ms/iter" vs the real 388 in the
    # round-5 train-step trace)
    from tools.xplane import device_step_budget

    budget = device_step_budget(paths[0])
    # sub-ms "steps" are auxiliary dispatches (e.g. the fence's jit_ravel),
    # not iterations — counting them halves every per-step figure
    steps = [s for s in budget["steps_ms"] if s > 1.0] or [float("nan")]
    n = max(len(steps), 1)
    wall = sum(steps) / n
    print(f"stage={args.stage} batch={b} iters={args.iters} "
          f"Steps-line wall {wall:.1f} ms/step over {n} steps "
          f"(async DMA {budget['async_ms'] / n:.0f} ms/step overlapped)")
    print(f"{'hlo_category':26s} {'ms/step':>9s} {'GFLOP/step':>11s} "
          f"{'TF/s':>7s}")
    for cat, (ms, fl) in sorted(budget["categories"].items(),
                                key=lambda kv: -kv[1][0]):
        if ms / n < 0.05:
            continue
        print(f"{cat:26s} {ms / n:9.1f} {fl / n / 1e9:11.1f} "
              f"{(fl / (ms / 1e3) / 1e12) if ms else 0:7.1f}")
    print(f"XLA-stat flops {budget['flops'] / n / 1e9:.0f} GFLOP/step -> "
          f"{budget['flops'] / n / (wall / 1e3) / 1e12:.1f} TF/s achieved "
          f"(vs 197 TF/s bf16 peak)")

    agg = parse_xplane(paths[0])
    total = sum(agg.values())
    print(f"top sync ops (device total {total:.2f} ms, "
          f"{total / args.iters:.2f} ms/iter):")
    for name, ms in agg.most_common(args.top):
        print(f"{ms / args.iters:9.3f} ms  {100 * ms / total:5.1f}%  {name[:140]}")


if __name__ == "__main__":
    main()
