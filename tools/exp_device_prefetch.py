"""Interleaved A/B: DeviceLoader device_prefetch (mover-thread transfer
overlap) vs synchronous _to_device, on the end-to-end flagship train loop.

The e2e train number (BENCH_MODE=train) was 5.4 clips/s vs 20.3 device-side:
the gap is the host->device move of ~13 MB/batch-8 (~280 ms at this
environment's ~46 MB/s tunnel) plus host decode, paid serially between
steps when _to_device runs in the consumer.  device_prefetch > 0 runs
_to_device in a dedicated thread so batch N+1's transfer and preprocess
dispatch ride the wire/chip while step N executes.

Usage: python tools/exp_device_prefetch.py [--batch 8] [--iters 6]
       [--rounds 3] [--img-w 1280] [--img-h 720]
Prints per-arm clips/s per round plus a phase breakdown of the sync arm
(time blocked in next(loader) vs step+fence).
"""

from __future__ import annotations

import argparse
import os.path as osp
import shutil
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--img-w", type=int, default=1280)
    ap.add_argument("--img-h", type=int, default=720)
    args = ap.parse_args()

    from otpose_tpu.utils.backend import ensure_live_backend
    ensure_live_backend()

    import jax
    import jax.numpy as jnp

    from tests.helpers.synthetic_data import make_synthetic_posetrack

    from otpose_tpu.data.device_loader import DeviceLoader
    from otpose_tpu.data.posetrack import PoseTrackDataset
    from otpose_tpu.engine.optim import make_optimizer, make_schedule
    from otpose_tpu.engine.trainer import init_train_state, make_train_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    backend = jax.default_backend()
    root = tempfile.mkdtemp(prefix="otpose_dp_")
    try:
        n_samples = max(args.batch * (args.iters + 2), 64)
        json_dir, img_dir, _ = make_synthetic_posetrack(
            root, num_videos=2,
            frames_per_video=max(4, n_samples // (2 * 4)),
            people_per_frame=4, img_w=args.img_w, img_h=args.img_h)
        cfg = flagship_otpose_cfg()
        cfg.DATASET.JSON_DIR = json_dir
        cfg.DATASET.IMG_DIR = img_dir
        cfg.DATASET.COLOR_RGB = True
        cfg.TRAIN.PROB_HALF_BODY = 0.0
        cfg.TPU.REMAT = args.batch > 8

        spec = OTPoseSpec.from_cfg(cfg)
        params, state = init_otpose(jax.random.PRNGKey(0), spec)
        ds = PoseTrackDataset(cfg, "train")
        loader = DeviceLoader(ds, args.batch, shuffle=True,
                              num_workers=cfg.WORKERS, drop_last=True,
                              prefetch=2, device_prefetch=2)
        schedule = make_schedule(cfg, max(1, len(loader)))
        optimizer = make_optimizer(params, cfg, schedule)
        ts = init_train_state(params, state, optimizer)
        compute = jnp.bfloat16 if backend == "tpu" else jnp.float32
        step_fn = make_train_step(spec, optimizer, compute_dtype=compute,
                                  donate=True, remat=cfg.TPU.REMAT)
        rng = jax.random.PRNGKey(0)

        def fence(t):
            float(np.asarray(jax.device_get(t.step)))

        keys = ("inputs", "margin", "target", "target_weight")

        def run_epoch(dp: int, epoch: int, iters: int):
            """Returns (clips/s, s blocked in next(), s in step+tail)."""
            nonlocal ts
            loader.device_prefetch = dp
            loader.set_epoch(epoch)
            done = 0
            wait_s = 0.0
            t0 = time.perf_counter()
            it = iter(loader)
            while done < iters:
                w0 = time.perf_counter()
                try:
                    b, _ = next(it)
                except StopIteration:
                    break
                wait_s += time.perf_counter() - w0
                ts, _m = step_fn(ts, {k: b[k] for k in keys},
                                 jax.random.fold_in(rng, epoch * 1000 + done))
                done += 1
            fence(ts)
            dt = time.perf_counter() - t0
            del it
            return args.batch * done / dt, wait_s / max(done, 1), \
                (dt - wait_s) / max(done, 1)

        print(f"backend={backend} batch={args.batch} iters/arm={args.iters} "
              f"img={args.img_w}x{args.img_h} remat={cfg.TPU.REMAT}")
        # warm: compiles preprocess + step
        run_epoch(2, 0, 2)
        run_epoch(0, 0, 2)

        for r in range(args.rounds):
            for dp in (0, 2):
                clips, wait, rest = run_epoch(dp, 100 + r * 2 + (dp > 0), args.iters)
                print(f"round {r} device_prefetch={dp}: {clips:6.2f} clips/s "
                      f"(next() {wait*1e3:6.1f} ms/it, step+tail "
                      f"{rest*1e3:6.1f} ms/it)", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
