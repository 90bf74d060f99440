"""Heatmap target generation and keypoint decoding.

Numerics replicate the reference exactly (ref: utils/heatmap.py:48-171):
unnormalized gaussians (peak 1.0) placed at truncated-rounded grid coords,
written only inside the clipped 3-sigma window; argmax decode with the
quarter-pixel gradient-sign shift; affine back-projection to image coords.

Target generation is vectorized (no per-joint python loops) and has both a
numpy host path and a jit-able JAX path for on-device batched generation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from otpose_tpu.ops.affine import exec_affine_transform, get_affine_transform


def _trunc_int(x: np.ndarray) -> np.ndarray:
    """python int() semantics: truncation toward zero."""
    return np.trunc(x).astype(np.int64)


def generate_heatmaps(joints: np.ndarray, joints_vis: np.ndarray, sigma: float,
                      image_size, heatmap_size, num_joints: int, **kwargs):
    """Gaussian targets + per-joint weights (ref: utils/heatmap.py:48-105).

    joints: (J, 3) in input-image coords; joints_vis: (J, 3) with vis in col 0.
    image_size/heatmap_size: (w, h). Returns (target (J, Hh, Hw), weight (J, 1)).
    """
    image_size = np.asarray(image_size, dtype=np.float64)
    heatmap_size = np.asarray(heatmap_size, dtype=np.float64)
    hm_w, hm_h = int(heatmap_size[0]), int(heatmap_size[1])

    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]

    tmp_size = sigma * 3
    feat_stride = image_size / heatmap_size
    mu_x = _trunc_int(joints[:, 0] / feat_stride[0] + 0.5)  # (J,)
    mu_y = _trunc_int(joints[:, 1] / feat_stride[1] + 0.5)
    ul_x, ul_y = mu_x - int(tmp_size), mu_y - int(tmp_size)
    br_x, br_y = mu_x + int(tmp_size) + 1, mu_y + int(tmp_size) + 1

    oob = (ul_x >= hm_w) | (ul_y >= hm_h) | (br_x < 0) | (br_y < 0)
    target_weight[oob, 0] = 0

    xs = np.arange(hm_w, dtype=np.float32)[None, None, :]   # (1, 1, Hw)
    ys = np.arange(hm_h, dtype=np.float32)[None, :, None]   # (1, Hh, 1)
    dx = xs - mu_x[:, None, None].astype(np.float32)
    dy = ys - mu_y[:, None, None].astype(np.float32)
    g = np.exp(-(dx ** 2 + dy ** 2) / (2 * sigma ** 2))
    # only the clipped window region is written; the tail outside stays 0
    window = (np.abs(dx) <= tmp_size) & (np.abs(dy) <= tmp_size)
    visible = (target_weight[:, 0] > 0.5)[:, None, None]
    target = np.where(window & visible & ~oob[:, None, None], g, 0.0).astype(np.float32)

    if kwargs.get("use_different_joints_weight"):
        target_weight = np.multiply(target_weight, kwargs["joints_weight"])
    return target, target_weight


@functools.partial(jax.jit, static_argnames=("hm_w", "hm_h", "num_joints"))
def generate_heatmaps_device(joints: jnp.ndarray, joints_vis: jnp.ndarray,
                             sigma: jnp.ndarray, feat_stride: jnp.ndarray,
                             hm_w: int, hm_h: int, num_joints: int):
    """Batched on-device gaussian target generation.

    joints: (B, J, 2); joints_vis: (B, J); sigma: scalar; feat_stride: (2,).
    Returns target (B, J, Hh, Hw), weight (B, J, 1). Semantics match
    ``generate_heatmaps`` (truncation rounding, 3-sigma window, peak 1.0).
    """
    tmp_size = sigma * 3.0
    mu = jnp.trunc(joints / feat_stride[None, None, :] + 0.5)  # (B, J, 2)
    mu_x, mu_y = mu[..., 0], mu[..., 1]
    itmp = jnp.trunc(tmp_size)
    ul_x, ul_y = mu_x - itmp, mu_y - itmp
    br_x, br_y = mu_x + itmp + 1, mu_y + itmp + 1
    oob = (ul_x >= hm_w) | (ul_y >= hm_h) | (br_x < 0) | (br_y < 0)
    weight = jnp.where(oob, 0.0, joints_vis)  # (B, J)

    xs = jnp.arange(hm_w, dtype=jnp.float32)[None, None, None, :]
    ys = jnp.arange(hm_h, dtype=jnp.float32)[None, None, :, None]
    dx = xs - mu_x[..., None, None]
    dy = ys - mu_y[..., None, None]
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2 * sigma ** 2))
    window = (jnp.abs(dx) <= tmp_size) & (jnp.abs(dy) <= tmp_size)
    visible = (weight > 0.5)[..., None, None]
    target = jnp.where(window & visible, g, 0.0)
    return target, weight[..., None]


def get_max_preds(batch_heatmaps: np.ndarray):
    """Argmax decode (ref: utils/heatmap.py:143-171). heatmaps: (B, J, H, W)."""
    assert batch_heatmaps.ndim == 4, "batch_images should be 4-ndim"
    batch_size, num_joints = batch_heatmaps.shape[:2]
    width = batch_heatmaps.shape[3]
    flat = batch_heatmaps.reshape((batch_size, num_joints, -1))
    idx = np.argmax(flat, 2).reshape((batch_size, num_joints, 1))
    maxvals = np.amax(flat, 2).reshape((batch_size, num_joints, 1))

    preds = np.tile(idx, (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % width
    preds[:, :, 1] = np.floor(preds[:, :, 1] / width)

    pred_mask = np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    preds *= pred_mask
    return preds, maxvals


@jax.jit
def get_max_preds_device(batch_heatmaps: jnp.ndarray):
    """On-device argmax decode; same semantics as ``get_max_preds``."""
    b, j, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)[..., None]
    px = (idx % w).astype(jnp.float32)
    py = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([px, py], axis=-1)
    preds = preds * (maxvals > 0.0).astype(jnp.float32)
    return preds, maxvals


@jax.jit
def refine_coords_device(batch_heatmaps: jnp.ndarray):
    """Argmax + quarter-pixel gradient shift, fully on device.

    Replicates the post-processing loop of ``get_final_preds``
    (ref: utils/heatmap.py:114-123): for peaks strictly inside the border
    (1 < p < size-1), shift 0.25 px toward the gradient sign.
    Returns (coords (B, J, 2), maxvals (B, J, 1)) in heatmap space.
    """
    b, j, h, w = batch_heatmaps.shape
    coords, maxvals = get_max_preds_device(batch_heatmaps)
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)

    flat = batch_heatmaps.reshape(b, j, h * w)

    def sample(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None], axis=2)[..., 0]

    dx = sample(py, px + 1) - sample(py, px - 1)
    dy = sample(py + 1, px) - sample(py - 1, px)
    inner = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    coords = coords + shift * inner[..., None].astype(coords.dtype)
    return coords, maxvals


def transform_preds(coords: np.ndarray, center, scale, output_size) -> np.ndarray:
    """Heatmap coords -> original image coords (ref: utils/heatmap.py:135-140)."""
    target_coords = np.zeros(coords.shape)
    trans = get_affine_transform(center, scale, 0, output_size, inv=1)
    for p in range(coords.shape[0]):
        target_coords[p, 0:2] = exec_affine_transform(coords[p, 0:2], trans)
    return target_coords


def get_final_preds(batch_heatmaps: np.ndarray, center: np.ndarray, scale: np.ndarray):
    """Full decode: argmax + quarter-pixel + back-projection
    (ref: utils/heatmap.py:108-132). Heatmaps on host as (B, J, H, W) numpy.
    """
    coords, maxvals = refine_coords_device(jnp.asarray(batch_heatmaps))
    coords, maxvals = np.asarray(coords), np.asarray(maxvals)
    heatmap_height = batch_heatmaps.shape[2]
    heatmap_width = batch_heatmaps.shape[3]
    preds = coords.copy()
    for i in range(coords.shape[0]):
        preds[i] = transform_preds(coords[i], center[i], scale[i],
                                   [heatmap_width, heatmap_height])
    return preds, maxvals


def normalize_0_to_1(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Per-map min-max normalization (ref: utils/heatmap.py:174-178)."""
    min_val = heatmaps.min(axis=(-2, -1), keepdims=True)
    max_val = heatmaps.max(axis=(-2, -1), keepdims=True)
    return (heatmaps - min_val) / max_val


def adjust_sigma(epoch: int, sigma: float, schedule, gamma: float = 0.5) -> float:
    """Sigma annealing (ref: utils/heatmap.py:181-187)."""
    for step in schedule:
        if epoch >= step:
            sigma -= 1
    return max(sigma, 1)
