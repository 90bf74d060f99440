"""Deformable position-sensitive RoI pooling (DCN v1's deform_pool).

ref: thirdparty/deform_conv/src/deform_pool_cuda.cpp:6-80 +
deform_pool_cuda_kernel.cu:43-130.  Imported at package level by the
reference (thirdparty/deform_conv/__init__.py:2) but NOT used by the OTPose
forward path — provided for package-API parity.  Pure-JAX vectorized
formulation; autodiff supplies the backward.

Semantics: per (roi, out-channel, ph, pw) bin, average `sample_per_part`^2
bilinear samples from the position-sensitive channel
``(ctop*group_size + gh)*group_size + gw``, with optional per-part learned
offsets scaled by ``trans_std``; samples outside [-0.5, size-0.5] are
skipped; in-range coords clamp to [0, size-1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size", "output_dim", "group_size",
                                             "part_size", "sample_per_part",
                                             "no_trans"))
def deform_psroi_pool(x: jnp.ndarray, rois: jnp.ndarray, trans: jnp.ndarray | None, *,
                      spatial_scale: float, out_size: int, output_dim: int,
                      group_size: int = 1, part_size: int | None = None,
                      sample_per_part: int = 4, trans_std: float = 0.0,
                      no_trans: bool = True):
    """x: (B, H, W, C) NHWC with C == output_dim*group_size^2;
    rois: (N, 5) [batch_idx, x1, y1, x2, y2];
    trans: (N, 2*num_classes, part, part) offsets or None.
    Returns (top (N, out, out, output_dim), top_count same shape)."""
    part_size = part_size or out_size
    b, h, w, c = x.shape
    n = rois.shape[0]
    ps = out_size

    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    start_h = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    end_w = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    end_h = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_w = roi_w / ps
    bin_h = roi_h / ps
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    ph = jnp.arange(ps)
    pw = jnp.arange(ps)
    part_h = jnp.floor(ph / ps * part_size).astype(jnp.int32)     # (ps,)
    part_w = jnp.floor(pw / ps * part_size).astype(jnp.int32)
    gh = jnp.clip(jnp.floor(ph * group_size / ps).astype(jnp.int32), 0, group_size - 1)
    gw = jnp.clip(jnp.floor(pw * group_size / ps).astype(jnp.int32), 0, group_size - 1)

    ctop = jnp.arange(output_dim)
    if no_trans or trans is None:
        trans_x = jnp.zeros((n, output_dim, ps, ps))
        trans_y = jnp.zeros((n, output_dim, ps, ps))
    else:
        num_classes = trans.shape[1] // 2
        channels_each = output_dim // num_classes
        class_id = ctop // channels_each                           # (O,)
        tx = trans[:, 0::2]                                        # (N, num_classes, part, part)
        ty = trans[:, 1::2]
        trans_x = tx[:, class_id][:, :, part_h][:, :, :, part_w] * trans_std
        trans_y = ty[:, class_id][:, :, part_h][:, :, :, part_w] * trans_std

    # sample start coords (N, O, ps, ps)
    wstart = (pw[None, None, None, :] * bin_w[:, None, None, None]
              + start_w[:, None, None, None] + trans_x * roi_w[:, None, None, None])
    hstart = (ph[None, None, :, None] * bin_h[:, None, None, None]
              + start_h[:, None, None, None] + trans_y * roi_h[:, None, None, None])

    # position-sensitive channel per (O, ph, pw)
    chan = (ctop[:, None, None] * group_size + gh[None, :, None]) * group_size \
        + gw[None, None, :]                                        # (O, ps, ps)

    iw = jnp.arange(sample_per_part)
    sw = wstart[..., None, None] + iw[None, None, None, None, None, :] \
        * sub_w[:, None, None, None, None, None]
    sh = hstart[..., None, None] + iw[None, None, None, None, :, None] \
        * sub_h[:, None, None, None, None, None]                   # (N, O, ps, ps, s, s)

    valid = (sw >= -0.5) & (sw <= w - 0.5) & (sh >= -0.5) & (sh <= h - 0.5)
    swc = jnp.clip(sw, 0.0, w - 1.0)
    shc = jnp.clip(sh, 0.0, h - 1.0)

    x_rois = x[batch_ind]                                          # (N, H, W, C)
    xg = x_rois.transpose(0, 3, 1, 2).reshape(n, c, h * w)

    x0 = jnp.floor(swc).astype(jnp.int32)
    y0 = jnp.floor(shc).astype(jnp.int32)
    lx = swc - x0
    ly = shc - y0
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    chan_b = jnp.broadcast_to(chan[None, ..., None, None], sw.shape).astype(jnp.int32)

    def gather(yy, xx):
        idx = chan_b * (h * w) + yy * w + xx                       # (N, O, ps, ps, s, s)
        flat = xg.reshape(n, c * h * w)
        return jnp.take_along_axis(flat, idx.reshape(n, -1), axis=1).reshape(idx.shape)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    val = (v00 * (1 - lx) + v01 * lx) * (1 - ly) + (v10 * (1 - lx) + v11 * lx) * ly
    val = jnp.where(valid, val, 0.0)

    count = valid.sum(axis=(-2, -1))
    total = val.sum(axis=(-2, -1))
    out = jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)  # (N, O, ps, ps)
    return out.transpose(0, 2, 3, 1), count.transpose(0, 2, 3, 1)
