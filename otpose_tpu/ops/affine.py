"""Affine geometry ops.

Host-side matrix construction replicates the reference math exactly
(ref: utils/transform.py:76-126) but without cv2: ``cv2.getAffineTransform``
is an exact 3-point solve, done here with numpy.  Device-side batched warp
(`warp_affine`) replicates ``cv2.warpAffine(..., INTER_LINEAR)`` with
BORDER_CONSTANT 0 semantics as a single gather-based XLA computation so the
whole 5-frame crop stack can run on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def get_dir(src_point, rot_rad):
    """Rotate a 2-vector (ref: utils/transform.py:108-115)."""
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return [
        src_point[0] * cs - src_point[1] * sn,
        src_point[0] * sn + src_point[1] * cs,
    ]


def get_3rd_point(a, b):
    """Third point of the affine triangle (ref: utils/transform.py:118-120)."""
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 3-point affine solve == cv2.getAffineTransform(src, dst)."""
    a = np.zeros((6, 6), dtype=np.float64)
    b = np.zeros(6, dtype=np.float64)
    for i in range(3):
        a[i, 0:2] = src[i]
        a[i, 2] = 1.0
        a[i + 3, 3:5] = src[i]
        a[i + 3, 5] = 1.0
        b[i] = dst[i, 0]
        b[i + 3] = dst[i, 1]
    x = np.linalg.solve(a, b)
    return x.reshape(2, 3)


def get_affine_transform(center, scale, rot, output_size,
                         shift=np.array([0, 0], dtype=np.float32), inv=0) -> np.ndarray:
    """Center/scale/rot -> 2x3 crop matrix (ref: utils/transform.py:76-105).

    `scale` is in units of pixel_std=200; `output_size` is (w, h). `inv=1`
    returns the back-projection (crop -> original image) matrix.
    """
    center = np.asarray(center, dtype=np.float32)
    if not isinstance(scale, np.ndarray) and not isinstance(scale, list):
        scale = np.array([scale, scale])
    scale = np.asarray(scale, dtype=np.float32)
    shift = np.asarray(shift, dtype=np.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w = output_size[0]
    dst_h = output_size[1]

    rot_rad = np.pi * rot / 180.0
    src_dir = get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = get_3rd_point(src[0, :], src[1, :])
    dst[2:, :] = get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def exec_affine_transform(pt, t) -> np.ndarray:
    """Apply a 2x3 affine to one point (ref: utils/transform.py:123-126)."""
    new_pt = np.array([pt[0], pt[1], 1.0]).T
    return np.dot(t, new_pt)[:2]


def apply_affine_to_points(points: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Apply a 2x3 affine to an (N, 2) array of points (vectorized)."""
    points = np.asarray(points, dtype=np.float64)
    return points @ t[:, :2].T + t[:, 2]


def invert_affine(t: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine matrix."""
    m = np.eye(3, dtype=np.float64)
    m[:2, :] = t
    return np.linalg.inv(m)[:2, :]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_affine(images: jnp.ndarray, inv_matrices: jnp.ndarray,
                out_h: int, out_w: int) -> jnp.ndarray:
    """Batched bilinear affine warp, matching cv2.warpAffine(INTER_LINEAR,
    BORDER_CONSTANT 0) given the *inverse* (dst->src) 2x3 matrices.

    Args:
      images: (B, H, W, C) float array.
      inv_matrices: (B, 2, 3) dst->src mapping (use ``invert_affine`` on the
        forward matrix from ``get_affine_transform``).
      out_h, out_w: output spatial size.

    Returns:
      (B, out_h, out_w, C) warped crops.
    """
    b, in_h, in_w, c = images.shape
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (out_h, out_w)

    # src coords per batch: (B, out_h, out_w)
    m = inv_matrices.astype(jnp.float32)
    src_x = (m[:, 0, 0, None, None] * grid_x[None] + m[:, 0, 1, None, None] * grid_y[None]
             + m[:, 0, 2, None, None])
    src_y = (m[:, 1, 0, None, None] * grid_x[None] + m[:, 1, 1, None, None] * grid_y[None]
             + m[:, 1, 2, None, None])

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < in_h) & (xi >= 0) & (xi < in_w)
        yc = jnp.clip(yi, 0, in_h - 1)
        xc = jnp.clip(xi, 0, in_w - 1)
        flat = images.reshape(b, in_h * in_w, c)
        idx = yc * in_w + xc  # (B, out_h, out_w)
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1)[..., None], axis=1)
        vals = vals.reshape(b, out_h, out_w, c)
        return vals * valid[..., None].astype(images.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(images.dtype)
    wy = wy[..., None].astype(images.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def warp_affine_separable(images: jnp.ndarray, inv_matrices: jnp.ndarray,
                          out_h: int, out_w: int) -> jnp.ndarray:
    """Axis-aligned (no rotation/shear) bilinear warp as two batched MXU
    matmuls — the TPU-native formulation.

    The dst->src map must be diagonal (``inv[:, 0, 1] == inv[:, 1, 0] == 0``;
    true for every eval/inference crop and for un-rotated training samples —
    ``get_affine_transform`` with rot=0 is scale+translate).  With tent
    weights ``T[i, s] = relu(1 - |coord_i - s|)`` the bilinear sample is the
    separable contraction ``out = Ty @ img @ Tx^T``, which reproduces
    cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT 0) exactly including border
    blending (out-of-range rows/cols get all-zero tents).

    Replaces the gather formulation for the device preprocessing hot path:
    measured on a v5e chip, the 4x take_along_axis gather costs ~65 ms per 8
    frames (1088x1920 -> 384x288) and ~170 s to compile; the two matmuls are
    ~100x cheaper and compile in seconds (CLAUDE.md TPU perf lessons).

    Args:
      images: (B, H, W, C) float array.
      inv_matrices: (B, 2, 3) diagonal dst->src mapping.
      out_h, out_w: output spatial size.
    Returns:
      (B, out_h, out_w, C) warped crops.
    """
    b, in_h, in_w, c = images.shape
    m = inv_matrices.astype(jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    src_y = m[:, 1, 1, None] * ys[None] + m[:, 1, 2, None]       # (B, out_h)
    src_x = m[:, 0, 0, None] * xs[None] + m[:, 0, 2, None]       # (B, out_w)

    iota_h = jnp.arange(in_h, dtype=jnp.float32)
    iota_w = jnp.arange(in_w, dtype=jnp.float32)
    ty = jnp.maximum(1.0 - jnp.abs(src_y[:, :, None] - iota_h), 0.0)  # (B, oh, H)
    tx = jnp.maximum(1.0 - jnp.abs(src_x[:, :, None] - iota_w), 0.0)  # (B, ow, W)

    imgs = images.astype(jnp.float32)
    tmp = jnp.einsum("boh,bhwc->bowc", ty, imgs,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("bpw,bowc->bopc", tx, tmp,
                     preferred_element_type=jnp.float32)
    return out.astype(images.dtype)


def fliplr_joints(joints: np.ndarray, joints_vis: np.ndarray, width: int,
                  matched_parts) -> tuple[np.ndarray, np.ndarray]:
    """Horizontal joint flip with left/right pair swap (ref: utils/transform.py:59-73)."""
    joints = joints.copy()
    joints_vis = joints_vis.copy()
    joints[:, 0] = width - joints[:, 0] - 1
    for pair in matched_parts:
        joints[pair[0], :], joints[pair[1], :] = \
            joints[pair[1], :].copy(), joints[pair[0], :].copy()
        joints_vis[pair[0], :], joints_vis[pair[1], :] = \
            joints_vis[pair[1], :].copy(), joints_vis[pair[0], :].copy()
    return joints * joints_vis, joints_vis
