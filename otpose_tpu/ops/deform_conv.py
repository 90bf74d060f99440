"""Modulated deformable convolution (DCNv2), TPU-native.

Replaces the reference CUDA op (ref: thirdparty/deform_conv/src/
deform_conv_cuda.cpp:474-551, deform_conv_cuda_kernel.cu:505-805) with a
gather-free tent-matmul XLA formulation that JAX autodiffs (offset/mask/
weight/input grads for free).  Two Pallas kernels and a batched-tap scan
variant were built, measured slower at the flagship shape, and deleted —
see STATUS.md "Deform kernel analysis" for the receipts.

Semantics (validated against a dense numpy oracle in tests):
- offsets (B, H, W, dg*2*K) with per-group channel layout
  ``[2*(i*kw+j)] = dy, [2*(i*kw+j)+1] = dx`` (ref: ..._kernel.cu:159-165)
- sample position = p + k*dilation - pad + offset, bilinear, zero outside
  (samples with h_im in (-1, H) contribute their in-bounds corners)
- modulated: sampled value multiplied by mask (B, H, W, dg*K) *before* the
  weight contraction; the reference applies NO sigmoid to the mask
  (ref: model/OTPose.py:381-385 feeds raw conv output)
- output[o] = sum_c sum_k w[o, c, k] * mask[g(c), k] * sample(x[c]) + bias[o]

Layouts here are TPU-native: activations NHWC, weight (K, K, C_in, C_out).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding", "dilation",
                                             "deformable_groups"))
def modulated_deform_conv_gather(x: jnp.ndarray, offsets: jnp.ndarray, mask: jnp.ndarray,
                          weight: jnp.ndarray, bias: jnp.ndarray | None = None, *,
                          kernel: int = 3, stride: int = 1, padding: int = 1,
                          dilation: int = 1, deformable_groups: int = 1) -> jnp.ndarray:
    """DCNv2 forward.

    Args:
      x: (B, H, W, C) input.
      offsets: (B, Ho, Wo, dg*2*K2) with (dy, dx) interleaved per kernel tap.
      mask: (B, Ho, Wo, dg*K2) modulation (raw, no sigmoid).
      weight: (Kh, Kw, C, C_out).
      bias: (C_out,) or None.
    Returns:
      (B, Ho, Wo, C_out).
    """
    b, h, w, c = x.shape
    k2 = kernel * kernel
    dg = deformable_groups
    bo, ho, wo, _ = offsets.shape
    assert bo == b

    # base sampling grid (Ho, Wo)
    ys = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)
    xs = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)
    # kernel tap displacements (K2,)
    ki = jnp.arange(k2, dtype=jnp.float32)
    tap_dy = jnp.floor(ki / kernel) * dilation
    tap_dx = (ki % kernel) * dilation

    # offsets -> (B, Ho, Wo, dg, K2, 2{dy,dx})
    off = offsets.reshape(b, ho, wo, dg, k2, 2)
    dy = off[..., 0]
    dx = off[..., 1]
    # sample coords (B, Ho, Wo, dg, K2)
    sy = ys[None, :, None, None, None] + tap_dy[None, None, None, None, :] + dy
    sx = xs[None, None, :, None, None] + tap_dx[None, None, None, None, :] + dx

    # reference validity check (kernel.cu:556): contribute iff -1 < p < size
    valid = (sy > -1) & (sy < h) & (sx > -1) & (sx < w)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    cpg = c // dg  # channels per deformable group

    # gather helper: indices (B, Ho, Wo, dg, K2) into x's (H, W) per channel.
    # We gather all C channels for each (dg, K2) slot but only keep the
    # group's channels, done by arranging x as (B, dg, cpg, H*W).
    xg = x.transpose(0, 3, 1, 2).reshape(b, dg, cpg, h * w)

    def gather(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc)  # (B, Ho, Wo, dg, K2)
        idx_flat = idx.transpose(0, 3, 1, 2, 4).reshape(b, dg, 1, ho * wo * k2)
        idx_flat = jnp.broadcast_to(idx_flat, (b, dg, cpg, ho * wo * k2))
        vals = jnp.take_along_axis(xg, idx_flat, axis=3)
        vals = vals.reshape(b, dg, cpg, ho, wo, k2)
        ok_t = ok.transpose(0, 3, 1, 2, 4)[:, :, None]  # (B, dg, 1, Ho, Wo, K2)
        return vals * ok_t.astype(vals.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wyt = wy.transpose(0, 3, 1, 2, 4)[:, :, None].astype(x.dtype)
    wxt = wx.transpose(0, 3, 1, 2, 4)[:, :, None].astype(x.dtype)
    top = v00 * (1 - wxt) + v01 * wxt
    bot = v10 * (1 - wxt) + v11 * wxt
    sampled = top * (1 - wyt) + bot * wyt  # (B, dg, cpg, Ho, Wo, K2)

    valid_t = valid.transpose(0, 3, 1, 2, 4)[:, :, None].astype(x.dtype)
    sampled = sampled * valid_t

    m = mask.reshape(b, ho, wo, dg, k2).transpose(0, 3, 1, 2, 4)[:, :, None]
    sampled = sampled * m.astype(x.dtype)

    # contract with weight: out[b,ho,wo,o] = sum_{dg,cpg,k} sampled * w
    wk = weight.reshape(k2, c, -1).reshape(k2, dg, cpg, -1)  # (K2, dg, cpg, O)
    out = jnp.einsum("bgchwk,kgco->bhwo", sampled, wk,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def identity_filler_weight(channels: int, kernel: int = 3) -> jnp.ndarray:
    """The reference's ModulatedDeformConv weight init: identity pass-through
    (1.0 at the kernel center on the diagonal) (ref: model/OTPose.py:462-469).
    Returned in our (Kh, Kw, C_in, C_out) layout.
    """
    w = jnp.zeros((kernel, kernel, channels, channels))
    ctr = kernel // 2
    diag = jnp.arange(channels)
    return w.at[ctr, ctr, diag, diag].set(1.0)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding", "dilation",
                                             "deformable_groups", "groups"))
def modulated_deform_conv(x: jnp.ndarray, offsets: jnp.ndarray, mask: jnp.ndarray,
                          weight: jnp.ndarray, bias: jnp.ndarray | None = None, *,
                          kernel: int = 3, stride: int = 1, padding: int = 1,
                          dilation: int = 1, deformable_groups: int = 1,
                          groups: int = 1) -> jnp.ndarray:
    """DCNv2 forward, gather-free TPU formulation (same signature/semantics
    as ``modulated_deform_conv_gather``, validated against the same oracle).

    Bilinear sampling is separable: with tent weights
    ``w(s, i) = relu(1 - |s - i|)`` the sample at (sy, sx) equals
    ``sum_y sum_x w(sy, y) * w(sx, x) * img[y, x]`` — exactly zero-padded
    bilinear including the borders (no valid-masks needed: out-of-range
    samples get all-zero tents).  The y-contraction becomes an MXU matmul and
    the x-contraction a VPU row-reduction; a ``lax.scan`` over the K*K taps
    keeps the transient tent tensors small.  TPU gathers (the naive
    formulation) are ~400x slower for this shape.

    Gradients: d(tent)/ds = -sign(s - i) on the support, which reproduces the
    reference backward's bilinear coordinate gradients
    (ref: deform_conv_cuda_kernel.cu:54-126) via plain autodiff.

    ``groups`` is the reference ModulatedDeformConv's weight-group count
    (ref: thirdparty/deform_conv/modules/deform_conv.py); weight is then
    (Kh, Kw, C_in/groups, C_out) and each group convolves its channel slice.
    Requires deformable_groups % groups == 0 so every weight group owns
    whole deformable groups (always true for the reference's uses).
    """
    if groups > 1:
        if deformable_groups % groups:
            raise ValueError("deformable_groups must be divisible by groups")
        b_, h_, w_, c_ = x.shape
        k2_ = kernel * kernel
        cin_g = c_ // groups
        cout_g = weight.shape[-1] // groups
        dg_g = deformable_groups // groups
        off = offsets.reshape(*offsets.shape[:3], groups, dg_g * 2 * k2_)
        msk = mask.reshape(*mask.shape[:3], groups, dg_g * k2_)
        outs = [
            modulated_deform_conv(
                x[..., g * cin_g:(g + 1) * cin_g], off[..., g, :],
                msk[..., g, :], weight[..., g * cout_g:(g + 1) * cout_g],
                None, kernel=kernel, stride=stride, padding=padding,
                dilation=dilation, deformable_groups=dg_g)
            for g in range(groups)
        ]
        out = jnp.concatenate(outs, axis=-1)
        return out if bias is None else out + bias.astype(out.dtype)
    b, h, w, c = x.shape
    k2 = kernel * kernel
    dg = deformable_groups
    cpg = c // dg
    bo, ho, wo, _ = offsets.shape
    p = ho * wo

    f32 = jnp.float32
    # base sampling grid
    ys = (jnp.arange(ho, dtype=f32) * stride - padding)
    xs = (jnp.arange(wo, dtype=f32) * stride - padding)
    base_y = jnp.broadcast_to(ys[:, None], (ho, wo)).reshape(p)
    base_x = jnp.broadcast_to(xs[None, :], (ho, wo)).reshape(p)

    off = offsets.reshape(b, p, dg, k2, 2).astype(f32)
    m_all = mask.reshape(b, p, dg, k2).astype(f32)

    iota_h = jnp.arange(h, dtype=f32)
    iota_w = jnp.arange(w, dtype=f32)
    xg = x.reshape(b, h, w, dg, cpg).astype(f32)
    # weight (Kh, Kw, C, O) -> (K2, dg, cpg, O)
    wk_all = weight.reshape(k2, dg, cpg, -1).astype(f32)

    ki = jnp.arange(k2, dtype=f32)
    tap_dy_all = jnp.floor(ki / kernel) * dilation
    tap_dx_all = (ki % kernel) * dilation

    # per-tap slices as explicit scan xs (not closed-over dynamic indexing)
    # so the scan VJP emits d(offsets)/d(mask) slices via in-place DUS
    # stacking instead of a full-buffer scatter-add per tap — see the
    # matching comment in modulated_deform_conv_multi
    off_t = off.transpose(3, 0, 1, 2, 4)       # (K2, B, P, dg, 2)
    msk_t = m_all.transpose(3, 0, 1, 2)        # (K2, B, P, dg)

    def tap_body(carry, xs):
        acc = carry
        off_i, msk_i, wk_i, dy_i, dx_i = xs
        sy = base_y[None, :, None] + dy_i + off_i[..., 0]
        sx = base_x[None, :, None] + dx_i + off_i[..., 1]
        # tent weights (B, P, dg, H) / (B, P, dg, W)
        wy = jnp.maximum(1.0 - jnp.abs(sy[..., None] - iota_h), 0.0)
        wx = jnp.maximum(1.0 - jnp.abs(sx[..., None] - iota_w), 0.0)
        # y-contraction on the MXU: (B, P, dg, H) x (B, H, W, dg, cpg)
        a = jnp.einsum("bpgy,bywgc->bpgwc", wy, xg,
                       preferred_element_type=f32)
        # x-contraction (VPU): (B, P, dg, W, cpg) * (B, P, dg, W)
        sampled = jnp.einsum("bpgwc,bpgw->bpgc", a, wx,
                             preferred_element_type=f32)
        sampled = sampled * msk_i[..., None]
        # weight contraction for this tap
        acc = acc + jnp.einsum("bpgc,gco->bpo", sampled, wk_i,
                               preferred_element_type=f32)
        return acc, None

    out0 = jnp.zeros((b, p, weight.shape[-1]), f32)
    # remat: without it the scan's linearization stores the (P, H)/(P, W)
    # tent tensors for every tap and the backward OOMs; recomputing them is
    # a few ms of MXU time
    out, _ = jax.lax.scan(jax.checkpoint(tap_body), out0,
                          (off_t, msk_t, wk_all, tap_dy_all, tap_dx_all))
    out = out.reshape(b, ho, wo, -1)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding",
                                             "dilation", "deformable_groups",
                                             "groups"))
def deform_conv(x: jnp.ndarray, offsets: jnp.ndarray, weight: jnp.ndarray,
                bias: jnp.ndarray | None = None, *, kernel: int = 3,
                stride: int = 1, padding: int = 1, dilation: int = 1,
                deformable_groups: int = 1, groups: int = 1) -> jnp.ndarray:
    """DCNv1 (unmodulated) deformable conv: DCNv2 with an all-ones mask
    (ref: thirdparty/deform_conv/functions/deform_conv.py::deform_conv,
    src/deform_conv_cuda.cpp:148-249).  Package-API parity for reference
    users; OTPose itself only uses the modulated form."""
    b, ho, wo, _ = offsets.shape
    k2 = kernel * kernel
    ones = jnp.ones((b, ho, wo, deformable_groups * k2), x.dtype)
    return modulated_deform_conv(
        x, offsets, ones, weight, bias, kernel=kernel, stride=stride,
        padding=padding, dilation=dilation,
        deformable_groups=deformable_groups, groups=groups)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "padding_list",
                                             "dilation_list", "deformable_groups",
                                             "unroll"))
def modulated_deform_conv_multi(x: jnp.ndarray, offsets_list, masks_list,
                                weights, biases, *, kernel: int = 3,
                                stride: int = 1, padding_list=(1,),
                                dilation_list=(1,),
                                deformable_groups: int = 1,
                                unroll: int = 1) -> jnp.ndarray:
    """Mean of D modulated deformable convs over the same input in ONE scan
    of D*K*K taps (the OTPose refinement averages its 5 dilation branches,
    ref: OTPose.py:387-392; fusing shares the input staging and removes
    per-branch launch overhead).

    offsets_list/masks_list: length-D sequences of (B, Ho, Wo, dg*{2,1}*K2);
    weights: (D, Kh, Kw, C, O); biases: (D, O) or None.
    Returns the average of the D branch outputs.
    """
    d = len(offsets_list)
    b, h, w, c = x.shape
    k2 = kernel * kernel
    dg = deformable_groups
    cpg = c // dg
    bo, ho, wo, _ = offsets_list[0].shape
    p = ho * wo
    f32 = jnp.float32

    ys = (jnp.arange(ho, dtype=f32) * stride)
    xs = (jnp.arange(wo, dtype=f32) * stride)
    base_y = jnp.broadcast_to(ys[:, None], (ho, wo)).reshape(p)
    base_x = jnp.broadcast_to(xs[None, :], (ho, wo)).reshape(p)

    # offsets/tent construction stay f32 (bf16 would round sample positions
    # by up to ~0.5 px); the heavy contractions follow the input dtype — in
    # bf16 model mode the MXU runs them ~4x faster, and the (B,P,G,{H,W})
    # tent tensors halve their HBM footprint
    cd = x.dtype
    off = jnp.stack([o.reshape(b, p, dg, k2, 2) for o in offsets_list]).astype(f32)
    msk = jnp.stack([m.reshape(b, p, dg, k2) for m in masks_list]).astype(cd)
    wk = weights.reshape(d, k2, dg, cpg, -1).astype(cd)

    # static per-(dilation, tap) displacement incl. -padding
    ki = np.arange(k2)
    tap_table = np.zeros((d * k2, 2), np.float32)
    for di, (pad, dil) in enumerate(zip(padding_list, dilation_list)):
        tap_table[di * k2:(di + 1) * k2, 0] = (ki // kernel) * dil - pad
        tap_table[di * k2:(di + 1) * k2, 1] = (ki % kernel) * dil - pad
    tap_table = jnp.asarray(tap_table)

    iota_h = jnp.arange(h, dtype=f32)
    iota_w = jnp.arange(w, dtype=f32)
    xg = x.reshape(b, h, w, dg, cpg)
    preferred = f32 if cd == f32 else cd  # core._preferred: bf16 operands
    # with an f32 preferred output break the einsum VJP dtype rules

    xg1 = xg[..., 0] if cpg == 1 else None  # (B, H, W, G)

    # per-tap slices ride the scan as explicit xs (leading dim D*K2) instead
    # of being closed over and dynamically indexed by the loop counter: the
    # VJP of a scan writes d(xs) slices with in-place dynamic-update-slice
    # (scan's native stacking), whereas dynamic indexing turns the offsets
    # cotangent into a full-buffer scatter-add — a trace of the flagship
    # train step showed that scatter as a 150 ms serial while loop plus a
    # ~66 ms select_add pass over the f32 (D,B,P,G,K2,2) buffer (~45% of
    # the 485 ms step); see STATUS.md round-2 perf log
    off_t = off.transpose(0, 4, 1, 2, 3, 5).reshape(d * k2, b, p, dg, 2)
    msk_t = msk.transpose(0, 4, 1, 2, 3).reshape(d * k2, b, p, dg)
    wk_t = wk.reshape(d * k2, dg, cpg, -1)

    def tap_body(acc, xs):
        off_i, msk_i, wk_i, tap_i = xs
        sy = base_y[None, :, None] + tap_i[0] + off_i[..., 0]
        sx = base_x[None, :, None] + tap_i[1] + off_i[..., 1]
        wy = jnp.maximum(1.0 - jnp.abs(sy[..., None] - iota_h), 0.0).astype(cd)
        wx = jnp.maximum(1.0 - jnp.abs(sx[..., None] - iota_w), 0.0).astype(cd)
        if cpg == 1:
            # transposed contraction (the OTPose case, one channel per
            # deformable group): pixels land on the MXU lane (N) dimension
            # (N = P >> 128) instead of N = W = 72 — measured 25% faster at
            # the flagship shape than the bpgy,bywgc->bpgwc order
            a = jnp.einsum("bpgy,bywg->bgwp", wy, xg1,
                           preferred_element_type=preferred)
            sampled = jnp.einsum("bgwp,bpgw->bpg", a, wx,
                                 preferred_element_type=preferred)
            sampled = (sampled * msk_i)[..., None]
        else:
            a = jnp.einsum("bpgy,bywgc->bpgwc", wy, xg,
                           preferred_element_type=preferred)
            sampled = jnp.einsum("bpgwc,bpgw->bpgc", a, wx,
                                 preferred_element_type=preferred)
            sampled = sampled * msk_i[..., None]
        # f32 carry regardless of compute dtype (45-tap running sum)
        acc = acc + jnp.einsum("bpgc,gco->bpo", sampled, wk_i,
                               preferred_element_type=preferred).astype(f32)
        return acc, None

    out0 = jnp.zeros((b, p, weights.shape[-1]), f32)
    # ``unroll`` replicates the (checkpointed) body inside one loop step so
    # XLA can software-pipeline tap i+1's VPU tent construction against tap
    # i's MXU contraction; it multiplies live tent transients by the unroll
    # factor, so keep it small (see tools/exp_deform_unroll.py receipts)
    out, _ = jax.lax.scan(jax.checkpoint(tap_body), out0,
                          (off_t, msk_t, wk_t, tap_table), unroll=unroll)
    out = out / d
    if biases is not None:
        out = out + jnp.mean(biases.astype(f32), axis=0)
    return out.reshape(b, ho, wo, -1).astype(x.dtype)
