"""Batched on-device preprocessing.

The reference does per-box cv2 warps and target generation inside CPU
dataloader workers (ref: PoseTrackDataset.py:388-425) — the CPU hot loop in
SURVEY.md §3.3.  Here the host only decodes jpegs and draws augmentation
parameters; one jit-compiled function warps all 5 frames of the whole batch,
normalizes, and generates gaussian targets on the TPU.

Host -> device contract per batch:
  raw_frames  (B, 5, H, W, 3) uint8 (decoded, optionally pre-flipped/blurred)
  inv_trans   (B, 2, 3)  inverse crop matrices (shared by all 5 frames,
                          ref: PoseTrackDataset.py:389-399 uses one matrix)
  joints      (B, J, 2)  crop-space joint coords (host-warped, cheap)
  joints_vis  (B, J)
  margins     (B, 4)
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from otpose_tpu.data.posetrack import IMAGENET_MEAN, IMAGENET_STD
from otpose_tpu.ops.affine import warp_affine_separable
from otpose_tpu.ops.heatmap import generate_heatmaps_device


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "hm_h", "hm_w",
                                             "num_joints"))
def preprocess_batch(raw_frames: jnp.ndarray, inv_trans: jnp.ndarray,
                     joints: jnp.ndarray, joints_vis: jnp.ndarray,
                     sigma: jnp.ndarray, *, out_h: int, out_w: int,
                     hm_h: int, hm_w: int, num_joints: int) -> Dict[str, jnp.ndarray]:
    """(B, 5, H, W, 3) uint8 -> model-ready batch, fully on device."""
    b, f, h, w, c = raw_frames.shape
    flat = raw_frames.reshape(b * f, h, w, c).astype(jnp.float32)
    inv5 = jnp.repeat(inv_trans, f, axis=0)
    # separable (matmul) warp: device-path matrices are axis-aligned by
    # construction — rotated train samples are pre-warped on the host and
    # arrive with an identity matrix (see DeviceLoader._load_raw_sample)
    crops = warp_affine_separable(flat, inv5, out_h, out_w)  # (B*5, oh, ow, 3)
    crops = (crops / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    # (B, 5, oh, ow, 3) -> (B, oh, ow, 15) channel order (cur, prev, next, pprev, nnext)
    crops = crops.reshape(b, f, out_h, out_w, c).transpose(0, 2, 3, 1, 4)
    inputs = crops.reshape(b, out_h, out_w, f * c)

    feat_stride = jnp.asarray([out_w / hm_w, out_h / hm_h], jnp.float32)
    target, weight = generate_heatmaps_device(joints, joints_vis, sigma,
                                              feat_stride, hm_w, hm_h, num_joints)
    # (B, J, Hh, Hw) -> NHWC
    target = target.transpose(0, 2, 3, 1)
    return {"inputs": inputs, "target": target, "target_weight": weight}


@functools.partial(jax.jit, static_argnames=("hm_h", "hm_w", "num_joints"))
def preprocess_crops_batch(crops_u8: jnp.ndarray, joints: jnp.ndarray,
                           joints_vis: jnp.ndarray, sigma: jnp.ndarray, *,
                           hm_h: int, hm_w: int,
                           num_joints: int) -> Dict[str, jnp.ndarray]:
    """Pre-warped uint8 crops -> model-ready batch.

    The bandwidth-lean device path: the host ships (B, 5, oh, ow, 3) uint8
    crops (the information-theoretic minimum — exactly what the model
    consumes, ~2x smaller than the host path's normalized f32 stack and ~20x
    smaller than raw frames), and the device does normalize, the 15-channel
    temporal assembly, and gaussian target generation.  Pixel numerics equal
    the host path bit-for-bit (same cv2 warp on the host side).
    """
    b, f, oh, ow, c = crops_u8.shape
    crops = crops_u8.astype(jnp.float32)
    crops = (crops / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    inputs = crops.transpose(0, 2, 3, 1, 4).reshape(b, oh, ow, f * c)

    feat_stride = jnp.asarray([ow / hm_w, oh / hm_h], jnp.float32)
    target, weight = generate_heatmaps_device(joints, joints_vis, sigma,
                                              feat_stride, hm_w, hm_h, num_joints)
    target = target.transpose(0, 2, 3, 1)
    return {"inputs": inputs, "target": target, "target_weight": weight}


def collate_host_samples(samples) -> Dict[str, np.ndarray]:
    """Stack host-path samples (from PoseTrackDataset.get_sample_host)."""
    batch = {
        "inputs": np.stack([s["inputs"] for s in samples]),
        "target": np.stack([s["target"] for s in samples]),
        "target_weight": np.stack([s["target_weight"] for s in samples]),
        "margin": np.stack([s["margin"] for s in samples]),
    }
    metas = [s["meta"] for s in samples]
    return batch, metas
