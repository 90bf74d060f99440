"""Time the flagship train step (fwd+bwd+AdamW) on the current backend.

Usage: python tools/time_train_step.py [--batch 8] [--iters 10] [--no-remat]
Prints ms/step and train clips/sec/chip for the device-resident step
(input pipeline excluded; BENCH_MODE=train in bench.py measures e2e).
--ab-dropout interleaves dropout-on vs dropout-off steps in one process
(cross-process comparisons drift over the axon tunnel — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def build_step(args, spec, opt, dt):
    import jax
    import jax.numpy as jnp

    from otpose_tpu.engine.trainer import make_train_step

    if args.mode == "step":
        return make_train_step(spec, opt, compute_dtype=dt,
                               remat=not args.no_remat,
                               accum_steps=args.accum)

    from otpose_tpu.engine.trainer import compute_losses
    from otpose_tpu.models.core import Ctx

    def loss_fn(params, model_state, batch, rng):
        ctx = Ctx(params, model_state, train=True, rng=rng, compute_dtype=dt)
        total, (metrics, _) = compute_losses(ctx, batch, spec, 8, True)
        return total, metrics

    if not args.no_remat:
        loss_fn = jax.checkpoint(loss_fn)
    if args.mode == "fwd":
        def step(ts, batch, rng):
            _, metrics = loss_fn(ts.params, ts.model_state, batch, rng)
            return ts, metrics
    else:
        def step(ts, batch, rng):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts.params, ts.model_state, batch, rng)
            metrics["gsum"] = sum(jnp.sum(g) for g in
                                  jax.tree_util.tree_leaves(grads))
            return ts, metrics
    return jax.jit(step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-dropout", action="store_true",
                    help="zero all pdrops (isolates threefry RNG cost)")
    ap.add_argument("--ab-dropout", action="store_true",
                    help="same-process interleaved A/B: dropout on vs off")
    ap.add_argument("--mode", choices=["step", "fwd", "grad"], default="step",
                    help="step: full train step; fwd: loss value only; "
                         "grad: value_and_grad without the optimizer")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps (mode=step)")
    ap.add_argument("--cost", action="store_true",
                    help="print XLA cost analysis (GFLOP/step, bytes) and "
                         "the achieved TF/s -> train-step MFU")
    ap.add_argument("--ab-accum", action="store_true",
                    help="same-process interleaved A/B: one batch-2B accum-2 "
                         "step vs two batch-B steps (effective-batch parity)")
    ap.add_argument("--ab-batch", action="store_true",
                    help="same-process interleaved A/B: batch B without remat "
                         "vs batch 2B with remat, in clips/s (re-checks the "
                         "no-remat-at-8 sweet spot post-scan-xs)")
    args = ap.parse_args()

    from otpose_tpu.utils.backend import ensure_live_backend
    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from otpose_tpu.engine.optim import make_optimizer, make_schedule
    from otpose_tpu.engine.trainer import TrainState
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    cfg = flagship_otpose_cfg()
    spec = OTPoseSpec.from_cfg(cfg)
    if args.no_dropout:
        spec = dataclasses.replace(spec, proj_pdrop=0.0, path_pdrop=0.0)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    opt = make_optimizer(params, cfg, make_schedule(cfg, 1000))

    dt = jnp.float32 if (args.f32 or jax.default_backend() != "tpu") else jnp.bfloat16

    b = args.batch
    rng = np.random.RandomState(0)
    batch = {
        "inputs": jnp.asarray(rng.randn(b, 384, 288, 15), jnp.float32),
        "margin": jnp.ones((b, 4), jnp.float32),
        "target": jnp.asarray(rng.rand(b, 96, 72, 17), jnp.float32),
        "target_weight": jnp.ones((b, 17, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    def fence(m):
        return float(np.asarray(jax.device_get(m["final_loss"])))

    def timeit(step, ts):
        t0 = time.perf_counter()
        m = None
        for _ in range(args.iters):
            ts, m = step(ts, batch, key)
        fence(m)
        return (time.perf_counter() - t0) / args.iters, ts

    if args.ab_batch:
        # A: batch B, remat off (fits 16GB for B<=8 — CLAUDE.md); B: batch
        # 2B, remat on (required above 8).  Throughput race in clips/s: the
        # round-2 receipt (b8-no-remat 13.7% faster than b8-remat, and b16
        # -remat OOM-free) predates the scan-xs deform backward, which
        # shrank the step's live-transient profile.
        from otpose_tpu.engine.trainer import make_train_step as _mts

        step_s = _mts(spec, opt, compute_dtype=dt, remat=False, donate=False)
        step_l = _mts(spec, opt, compute_dtype=dt, remat=True, donate=False)
        big = {
            "inputs": jnp.asarray(rng.randn(2 * b, 384, 288, 15), jnp.float32),
            "margin": jnp.ones((2 * b, 4), jnp.float32),
            "target": jnp.asarray(rng.rand(2 * b, 96, 72, 17), jnp.float32),
            "target_weight": jnp.ones((2 * b, 17, 1), jnp.float32),
        }
        ts_a = TrainState(params, state, opt.init(params), 0)
        ts_b = TrainState(params, state, opt.init(params), 0)
        ts_a, m = step_s(ts_a, batch, key); fence(m)
        ts_b, m = step_l(ts_b, big, key); fence(m)
        for rnd in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ts_a, m = step_s(ts_a, batch, key)
            fence(m)
            dt_a = (time.perf_counter() - t0) / args.iters
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ts_b, m = step_l(ts_b, big, key)
            fence(m)
            dt_b = (time.perf_counter() - t0) / args.iters
            print(f"round {rnd}: b{b} no-remat {dt_a*1e3:.1f} ms "
                  f"({b/dt_a:.2f} clips/s)   b{2*b} remat {dt_b*1e3:.1f} ms "
                  f"({2*b/dt_b:.2f} clips/s)", flush=True)
        return

    if args.ab_accum:
        # A: one step at batch 2B with accum_steps=2 (activations stay at B);
        # B: two sequential steps at batch B.  Same clips/update either way;
        # A saves one optimizer pass + dispatch.
        from otpose_tpu.engine.trainer import make_train_step as _mts

        # donate=False: ts_a and ts_b share the same params/state buffers
        step_acc = _mts(spec, opt, compute_dtype=dt, remat=not args.no_remat,
                        accum_steps=2, donate=False)
        step_one = _mts(spec, opt, compute_dtype=dt, remat=not args.no_remat,
                        donate=False)
        big = {
            "inputs": jnp.asarray(rng.randn(2 * b, 384, 288, 15), jnp.float32),
            "margin": jnp.ones((2 * b, 4), jnp.float32),
            "target": jnp.asarray(rng.rand(2 * b, 96, 72, 17), jnp.float32),
            "target_weight": jnp.ones((2 * b, 17, 1), jnp.float32),
        }
        ts_a = TrainState(params, state, opt.init(params), 0)
        ts_b = TrainState(params, state, opt.init(params), 0)
        ts_a, m = step_acc(ts_a, big, key); fence(m)
        ts_b, m = step_one(ts_b, batch, key); fence(m)
        for rnd in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ts_a, m = step_acc(ts_a, big, key)
            fence(m)
            dt_a = (time.perf_counter() - t0) / args.iters
            t0 = time.perf_counter()
            for _ in range(2 * args.iters):
                ts_b, m = step_one(ts_b, batch, key)
            fence(m)
            dt_b = (time.perf_counter() - t0) / args.iters
            print(f"round {rnd}: accum2@{2*b} {dt_a*1e3:.1f} ms/update "
                  f"({2*b/dt_a:.2f} clips/s)   2x step@{b} {dt_b*1e3:.1f} "
                  f"ms ({2*b/dt_b:.2f} clips/s)   delta {(dt_a-dt_b)*1e3:+.1f} ms",
                  flush=True)
        return

    if args.ab_dropout:
        # donation would free ts under fn A while fn B still needs a live
        # copy; keep two independent states
        spec_b = dataclasses.replace(spec, proj_pdrop=0.0, path_pdrop=0.0)
        step_a = build_step(args, spec, opt, dt)
        step_b = build_step(args, spec_b, opt, dt)
        ts_a = TrainState(params, state, opt.init(params), 0)
        ts_b = TrainState(params, state, opt.init(params), 0)
        ts_a, m = step_a(ts_a, batch, key); fence(m)
        ts_b, m = step_b(ts_b, batch, key); fence(m)
        for rnd in range(3):
            dt_a, ts_a = timeit(step_a, ts_a)
            dt_b, ts_b = timeit(step_b, ts_b)
            print(f"round {rnd}: dropout {dt_a * 1e3:.1f} ms   "
                  f"no-dropout {dt_b * 1e3:.1f} ms   "
                  f"delta {(dt_a - dt_b) * 1e3:+.1f} ms")
        return

    step = build_step(args, spec, opt, dt)
    ts = TrainState(params, state, opt.init(params), 0)
    t0 = time.perf_counter()
    ts, metrics = step(ts, batch, key)
    fence(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    ts, metrics = step(ts, batch, key)
    fence(metrics)
    dt_s, ts = timeit(step, ts)
    print(f"mode={args.mode} batch={b} remat={not args.no_remat} "
          f"dtype={dt.__name__}: {dt_s * 1e3:.1f} ms/step = "
          f"{b / dt_s:.2f} train clips/s/chip")
    if args.cost:
        # XLA's own FLOP count for the compiled step -> train-step MFU
        # receipt (VERDICT r4 task 2).  bf16 peak for this chip matches the
        # eval-path MFU receipt in STATUS.md (197 TF/s v5e-class bf16).
        ca = step.lower(ts, batch, key).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        tf_s = flops / dt_s / 1e12
        print(f"cost analysis: {flops / 1e9:.1f} GFLOP/step "
              f"({flops / b / 1e9:.1f} GFLOP/clip), "
              f"{bytes_acc / 1e9:.2f} GB accessed; "
              f"achieved {tf_s:.1f} TF/s = {100 * tf_s / 197:.1f}% of bf16 "
              f"peak (197 TF/s)")


if __name__ == "__main__":
    main()
