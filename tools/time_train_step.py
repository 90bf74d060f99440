"""Time the flagship train step (fwd+bwd+AdamW) on the current backend.

Usage: python tools/time_train_step.py [--batch 8] [--iters 10] [--no-remat]
Prints ms/step and train clips/sec/chip for the device-resident step
(input pipeline excluded; BENCH_MODE=train in bench.py measures e2e).
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
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-dropout", action="store_true",
                    help="zero all pdrops (isolates threefry RNG cost)")
    ap.add_argument("--mode", choices=["step", "fwd", "grad"], default="step",
                    help="step: full train step; fwd: loss value only; "
                         "grad: value_and_grad without the optimizer")
    args = ap.parse_args()

    from otpose_tpu.utils.backend import ensure_live_backend
    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from otpose_tpu.engine.optim import make_optimizer, make_schedule
    from otpose_tpu.engine.trainer import TrainState, make_train_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    cfg = flagship_otpose_cfg()
    spec = OTPoseSpec.from_cfg(cfg)
    if args.no_dropout:
        import dataclasses
        spec = dataclasses.replace(spec, proj_pdrop=0.0, path_pdrop=0.0)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    opt = make_optimizer(params, cfg, make_schedule(cfg, 1000))
    ts = TrainState(params, state, opt.init(params), 0)

    dt = jnp.float32 if (args.f32 or jax.default_backend() != "tpu") else jnp.bfloat16
    if args.mode == "step":
        step = make_train_step(spec, opt, compute_dtype=dt,
                               remat=not args.no_remat)
    else:
        from otpose_tpu.engine.trainer import compute_losses
        from otpose_tpu.models.core import Ctx

        def loss_fn(params, model_state, batch, rng):
            ctx = Ctx(params, model_state, train=True, rng=rng,
                      compute_dtype=dt)
            total, (metrics, _) = compute_losses(ctx, batch, spec, 8, True)
            return total, metrics

        if not args.no_remat:
            loss_fn = jax.checkpoint(loss_fn)
        if args.mode == "fwd":
            def step(ts, batch, rng):  # noqa: ANN001
                _, metrics = loss_fn(ts.params, ts.model_state, batch, rng)
                return ts, metrics
        else:
            def step(ts, batch, rng):  # noqa: ANN001
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(ts.params, ts.model_state, batch, rng)
                metrics["gsum"] = sum(jnp.sum(g) for g in
                                      jax.tree_util.tree_leaves(grads))
                return ts, metrics
        step = jax.jit(step)

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

    t0 = time.perf_counter()
    ts, metrics = step(ts, batch, key)
    fence(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    ts, metrics = step(ts, batch, key)
    fence(metrics)

    t0 = time.perf_counter()
    m = None
    for _ in range(args.iters):
        ts, m = step(ts, batch, key)
    fence(m)
    dt_s = (time.perf_counter() - t0) / args.iters
    print(f"mode={args.mode} batch={b} remat={not args.no_remat} "
          f"dtype={dt.__name__}: {dt_s * 1e3:.1f} ms/step = "
          f"{b / dt_s:.2f} train clips/s/chip")


if __name__ == "__main__":
    main()
