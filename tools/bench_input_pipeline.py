"""Host input-pipeline throughput receipt (VERDICT r4 task 4).

Measures the REAL ``Loader`` end-to-end — per-sample jpeg decode of the
5-frame window + affine warp + normalize + target generation + collate —
at flagship geometry (1280x720 source jpegs, 384x288 crops), for the
native C++/OpenMP path (``native/otpose_io.cpp``) vs the cv2 fallback,
train and validate splits, over a worker-count sweep.

Prints a table of samples/s plus the per-core figure and the host core
count needed to clear the measured device rates (115.3 clips/s eval /
20.3 clips/s train) assuming the thread pool's linear scaling — on this
1-core dev host the absolute number is the per-core number; the scaling
assumption is the standard one for GIL-releasing cv2/jpeg work (the
reference's torch DataLoader makes it too, via worker processes:
ref: train.py:43-51).

Usage: python tools/bench_input_pipeline.py [--samples 96] [--batch 16]
       [--workers 1,2,4] [--videos 3] [--frames 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(root: str, videos: int, frames: int):
    from tests.helpers.synthetic_data import make_synthetic_posetrack

    from otpose_tpu.data.posetrack import PoseTrackDataset
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        root, num_videos=videos, frames_per_video=frames,
        people_per_frame=4, img_w=1280, img_h=720)
    cfg = flagship_otpose_cfg()
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir
    cfg.DATASET.COLOR_RGB = True
    cfg.TRAIN.PROB_HALF_BODY = 0.0
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    train_ds = PoseTrackDataset(cfg, "train")
    val_ds = PoseTrackDataset(cfg, "validate")
    return train_ds, val_ds


def measure(ds, *, batch: int, workers: int, native: bool,
            n_samples: int) -> float:
    from otpose_tpu.data.loader import Loader

    loader = Loader(ds, batch, shuffle=True, num_workers=workers,
                    drop_last=True, prefetch=4, native_host=native)
    # warm: touch one batch (thread pool spin-up, file cache)
    it = iter(loader)
    next(it)
    done = 0
    t0 = time.perf_counter()
    epoch = 0
    while done < n_samples:
        for b in it:
            done += batch
            if done >= n_samples:
                break
        else:
            epoch += 1
            loader.set_epoch(epoch)
            it = iter(loader)
    dt = time.perf_counter() - t0
    return done / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=str, default="1,2,4")
    ap.add_argument("--videos", type=int, default=3)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()
    workers = [int(w) for w in args.workers.split(",")]

    ncores = os.cpu_count() or 1
    root = tempfile.mkdtemp(prefix="otpose_iobench_")
    try:
        train_ds, val_ds = build_dataset(root, args.videos, args.frames)
        print(f"host cores={ncores}  dataset: {len(train_ds)} train / "
              f"{len(val_ds)} val samples  batch={args.batch}")
        print(f"{'split':9s} {'path':7s} {'workers':7s} {'samples/s':>10s}")
        best = {}
        for split, ds in (("train", train_ds), ("validate", val_ds)):
            for native in (True, False):
                for w in workers:
                    sps = measure(ds, batch=args.batch, workers=w,
                                  native=native, n_samples=args.samples)
                    tag = "native" if native else "cv2"
                    print(f"{split:9s} {tag:7s} {w:7d} {sps:10.2f}",
                          flush=True)
                    key = (split, native)
                    best[key] = max(best.get(key, 0.0), sps)
        per_core_eval = best[("validate", True)] / ncores
        per_core_train = best[("train", True)] / ncores
        print(f"\nper-core (native best): eval {per_core_eval:.2f} "
              f"train {per_core_train:.2f} samples/s/core")
        print("cores to clear device rates (linear scaling): "
              f"eval 115.3 clips/s -> {115.3 / per_core_eval:.1f} cores; "
              f"train 20.3 clips/s -> {20.3 / per_core_train:.1f} cores")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
