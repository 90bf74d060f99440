"""Device-preprocessing loader: host decodes JPEGs, TPU does the rest.

Replaces the reference's CPU hot loop (5x cv2.warpAffine + normalize +
gaussian targets per box inside worker processes, ref:
PoseTrackDataset.py:388-425) with batched jit programs.  Two modes:

- ``mode="crops"`` (default): host threads decode + cv2-warp the 5 frames to
  crop size and ship **uint8 crops** — the information-theoretic minimum,
  ~2x smaller than the host path's normalized f32 stack and ~20x smaller
  than raw frames; the device does normalize, the 15-channel temporal
  assembly, and gaussian target generation
  (`pipeline.preprocess_crops_batch`).  Pixel numerics are bit-identical to
  the host path (same cv2 call).  This is the right mode whenever
  host->device bandwidth is the constraint (it usually is; measured 46 MB/s
  over this environment's tunnel, where raw frames cap e2e training at ~1.4
  clips/s regardless of compute).
- ``mode="full"``: raw frames are staged into a fixed (max_h, max_w) uint8
  buffer and the 5-frame warp runs on the TPU as a separable tent matmul
  (`pipeline.preprocess_batch`); rotated train samples are pre-warped on the
  host (the separable warp handles axis-aligned maps).  The right mode on
  co-located hosts (PCIe/DMA) where shipping pixels is cheap and host CPU is
  the constraint.  A frame larger than the buffer raises a descriptive error
  telling the user to raise ``max_frame_hw`` (silent cropping would corrupt
  geometry).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np

from otpose_tpu.data import native
from otpose_tpu.data.loader import Loader
from otpose_tpu.data.posetrack import FLIP_PAIRS, JOINTS_WEIGHT
from otpose_tpu.ops.affine import (apply_affine_to_points, fliplr_joints,
                                   get_affine_transform, invert_affine)


class DeviceLoader(Loader):
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 8888, drop_last: bool = False,
                 prefetch: int = 2, max_frame_hw: Tuple[int, int] = (1088, 1920),
                 mode: str = "crops", device_prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        super().__init__(dataset, batch_size, shuffle=shuffle,
                         num_workers=num_workers, seed=seed,
                         drop_last=drop_last, prefetch=prefetch,
                         process_index=process_index,
                         process_count=process_count)
        self.max_h, self.max_w = max_frame_hw
        if mode not in ("crops", "full"):
            raise ValueError(f"DeviceLoader mode must be crops/full, got {mode!r}")
        self.mode = mode
        # >0: a dedicated mover thread runs _to_device, so the host->device
        # transfer (and the device preprocess dispatch) of batch N+k overlaps
        # the model step on batch N.  0 = move synchronously in the consumer.
        self.device_prefetch = device_prefetch

    # ---------------------------------------------------------------- host

    def _load_raw_sample(self, idx: int, rng: np.random.RandomState):
        """Window select + decode + host-side flip/blur + joint warp."""
        import copy

        import cv2

        ds = self.dataset
        record = copy.deepcopy(ds.data[idx])
        window = ds.select_window(record["image"], record["nframes"])

        if native.is_available():
            frames, hs, ws, fails = native.decode_jpeg_batch(
                window["files"], self.max_h, self.max_w)
            if fails:
                raise ValueError(
                    f"decode failure in {window['files']} (corrupt file, or a "
                    f"frame larger than the ({self.max_h}, {self.max_w}) "
                    f"staging buffer — raise DeviceLoader max_frame_hw)")
            h, w = int(hs[0]), int(ws[0])
            if not ds.color_rgb:
                # native decoder emits RGB; host path honors
                # DATASET.COLOR_RGB (ref: PoseTrackDataset.py:302-306)
                frames = np.ascontiguousarray(frames[..., ::-1])
        else:
            imgs = []
            for f in window["files"]:
                im = cv2.imread(f)  # BGR
                if im is None:
                    raise ValueError(f"Fail to read {f}")
                imgs.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
                            if ds.color_rgb else im)
            h, w = imgs[0].shape[:2]
            if h > self.max_h or w > self.max_w:
                raise ValueError(
                    f"frame {window['files'][0]} is ({h}, {w}) but the staging "
                    f"buffer is ({self.max_h}, {self.max_w}); raise "
                    f"DeviceLoader max_frame_hw")
            frames = np.zeros((5, self.max_h, self.max_w, 3), np.uint8)
            for i, im in enumerate(imgs):
                frames[i, :im.shape[0], :im.shape[1]] = im

        aug = ds.sample_augmentation(record, rng)
        joints, joints_vis = aug["joints"], aug["joints_vis"]
        center, scale, r = aug["center"], aug["scale"], aug["rotation"]

        if aug["do_flip"]:
            frames[:, :h, :w] = frames[:, :h, :w][:, :, ::-1]
            joints, joints_vis = fliplr_joints(joints, joints_vis, w, FLIP_PAIRS)
            center[0] = w - center[0] - 1
        if aug["do_blur"]:
            s = aug["blur_sigma"]
            for i in range(5):
                frames[i, :h, :w] = cv2.GaussianBlur(frames[i, :h, :w], (9, 5), s)

        trans = get_affine_transform(center, scale, r, ds.image_size)
        ow, oh = int(ds.image_size[0]), int(ds.image_size[1])
        if self.mode == "crops":
            # host cv2 warp (bit-identical to the host path, ref:
            # PoseTrackDataset.py:389-399); ship only the uint8 crops
            crops = np.stack([
                cv2.warpAffine(np.ascontiguousarray(frames[i, :h, :w]),
                               np.float64(trans), (ow, oh),
                               flags=cv2.INTER_LINEAR) for i in range(5)])
            frames, inv = crops, None
        elif r != 0:
            # Rotated sample (train-time, prob 0.5): the device warp is a
            # separable matmul and handles axis-aligned maps only, so warp
            # the 5 frames here with cv2 and hand the device an identity
            # matrix over the pre-cropped region.
            warped = np.zeros_like(frames)
            for i in range(5):
                warped[i, :oh, :ow] = cv2.warpAffine(
                    np.ascontiguousarray(frames[i, :h, :w]),
                    np.float64(trans), (ow, oh), flags=cv2.INTER_LINEAR)
            frames = warped
            inv = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
        else:
            inv = invert_affine(trans)
        joints_crop = joints[:, :2].copy()
        vis_mask = joints_vis[:, 0] > 0
        joints_crop[vis_mask] = apply_affine_to_points(joints[vis_mask, :2], trans)
        oob = ((joints_crop[:, 0] < 0) | (joints_crop[:, 1] < 0)
               | (joints_crop[:, 0] > ds.image_size[0])
               | (joints_crop[:, 1] > ds.image_size[1]))
        vis = np.where(vis_mask & ~oob, joints_vis[:, 0], 0.0).astype(np.float32)

        meta = {
            "image": record["image"],
            "sup_images": window["files"][1:],
            "center": center, "scale": scale, "rotation": r,
            "score": record.get("score", 1),
            "margin_left": window["margins"][0],
            "margin_right": window["margins"][1],
            "margin_lleft": window["margins"][2],
            "margin_rright": window["margins"][3],
        }
        return {"frames": frames, "inv": inv, "joints": joints_crop.astype(np.float32),
                "vis": vis, "margin": np.asarray(window["margins"], np.float32),
                "meta": meta}

    # -------------------------------------------------------------- device

    def _to_device(self, samples):
        import jax.numpy as jnp

        from otpose_tpu.data.pipeline import (preprocess_batch,
                                              preprocess_crops_batch)

        ds = self.dataset
        frames = np.stack([s["frames"] for s in samples])  # (B, 5, H|oh, W|ow, 3)
        joints = np.stack([s["joints"] for s in samples])
        vis = np.stack([s["vis"] for s in samples])
        if self.mode == "crops":
            out = preprocess_crops_batch(
                jnp.asarray(frames), jnp.asarray(joints), jnp.asarray(vis),
                jnp.float32(ds.sigma),
                hm_h=int(ds.heatmap_size[1]), hm_w=int(ds.heatmap_size[0]),
                num_joints=ds.num_joints)
        else:
            inv = np.stack([s["inv"] for s in samples])
            out = preprocess_batch(
                jnp.asarray(frames), jnp.asarray(inv), jnp.asarray(joints),
                jnp.asarray(vis), jnp.float32(ds.sigma),
                out_h=int(ds.image_size[1]), out_w=int(ds.image_size[0]),
                hm_h=int(ds.heatmap_size[1]), hm_w=int(ds.heatmap_size[0]),
                num_joints=ds.num_joints)
        batch = dict(out)
        if ds.use_different_joints_weight:
            batch["target_weight"] = out["target_weight"] * \
                jnp.asarray(JOINTS_WEIGHT)[None]
        batch["margin"] = jnp.asarray(np.stack([s["margin"] for s in samples]))
        metas = [s["meta"] for s in samples]
        return batch, metas

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_sample(args):
            _bidx, idx = args
            rng = np.random.RandomState(
                (self.seed + self.epoch * 1_000_003 + idx) % (2 ** 31))
            return self._load_raw_sample(int(idx), rng)

        def producer():
            # forward failures to the consumer; never die without a sentinel
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for bidx, batch_idxs in enumerate(batches):
                        if stop.is_set():
                            break
                        samples = list(pool.map(load_sample,
                                                [(bidx, i) for i in batch_idxs]))
                        out_q.put(samples)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        threads = [thread]
        final_q = out_q
        # snapshot: the pipeline topology (mover thread, final_q) is fixed at
        # iterator entry, so a mid-epoch mutation of self.device_prefetch
        # (e.g. tools/exp_device_prefetch toggling arms) must not change
        # which stage the consumer thinks moved the batch
        device_prefetch = self.device_prefetch
        if device_prefetch > 0:
            # second pipeline stage: host samples -> device batches.  JAX
            # dispatch is thread-safe and async, so batch N+1's transfer
            # rides the wire while the chip executes step N; the queue bound
            # caps device memory at device_prefetch in-flight batches.
            dev_q: queue.Queue = queue.Queue(maxsize=device_prefetch)

            def mover():
                # sole consumer of out_q: drains it to the producer's None
                # sentinel no matter what (a _to_device failure is forwarded
                # and draining continues), so the producer can always finish
                # and shutdown never races this thread for the sentinel
                while True:
                    item = out_q.get()
                    if item is None or isinstance(item, BaseException):
                        dev_q.put(item)
                        if item is None:
                            return
                        continue
                    if stop.is_set():
                        continue
                    try:
                        moved = self._to_device(item)
                    except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                        stop.set()
                        dev_q.put(e)
                        continue
                    dev_q.put(moved)

            mv = threading.Thread(target=mover, daemon=True)
            mv.start()
            threads.append(mv)
            final_q = dev_q
        try:
            while True:
                item = final_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item if device_prefetch > 0 \
                    else self._to_device(item)
        finally:
            stop.set()
            # Unblock stages parked on a full queue until every thread exits.
            # Drain ONLY final_q: the mover is the sole out_q consumer and
            # always drains it to the sentinel (stealing out_q items here
            # would race it for the producer's None and strand it —
            # deadlocked exactly so before this comment existed).
            while any(t.is_alive() for t in threads):
                try:
                    final_q.get(timeout=0.05)
                except queue.Empty:
                    pass
