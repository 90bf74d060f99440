"""Pallas TPU kernel: fused multi-dilation modulated deformable convolution.

Fuses, per (batch, pixel-tile) grid cell, the whole OTPose refinement battery
(ref: thirdparty/deform_conv CUDA op + OTPose.py:381-392 aggregation): tent
weight construction, the bilinear y-matmul on the MXU, the x-reduction, mask
modulation, and the weight contraction — entirely in VMEM.  The XLA
formulation (otpose_tpu/ops/deform_conv.py) materializes the (P, H) tent
tensors in HBM (~360MB per tap per batch-8); this kernel never leaves VMEM
between stages.

Structure:
- grid (B, P/TP, D*K2, G/GC): tap and group-chunk are reduction dims over a
  persistent f32 VMEM accumulator (innermost-last iteration order)
- deformable groups are zero-padded to a multiple of GC (zero masks/weights
  make padded groups contribute nothing)
- the per-group y-contraction is a GC-batched (TP, H) @ (H, W) MXU dot
- offsets stay f32 throughout (bf16 would round sample positions by up to
  ~0.5px at these coordinates)
- backward routes through jax.custom_vjp to the autodiff of the XLA tent
  formulation (training remats anyway; the kernel is the inference hot path)
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otpose_tpu.ops import deform_conv as dc_xla


def _kernel(tap_ref, offy_ref, offx_ref, msk_ref, xg_ref, wk_ref, out_ref,
            acc_ref):
    """Block shapes:
    tap:  (DK, 2) full     [static tap dy/dx incl. -pad, indexed by program]
    offy: (1, 1, GC, TP)   [this tap's y-offsets, this group chunk]
    offx: (1, 1, GC, TP)
    msk:  (1, 1, GC, TP)
    xg:   (1, GC, H, W)
    wk:   (1, GC, O)
    out:  (1, TP, O)
    acc:  (TP, O) f32 scratch (persistent across tap/group grid dims)

    Layouts keep the large P dim minor-most everywhere (no lane padding).
    """
    i_tap = pl.program_id(2)
    n_tap = pl.num_programs(2)
    i_g = pl.program_id(3)
    n_g = pl.num_programs(3)
    tp = offy_ref.shape[3]
    h = xg_ref.shape[2]
    w = xg_ref.shape[3]

    @pl.when(jnp.logical_and(i_tap == 0, i_g == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p0 = pl.program_id(1) * tp
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1) + p0
    base_y = (pix // w).astype(jnp.float32)                # (1, TP)
    base_x = (pix % w).astype(jnp.float32)

    sy = base_y + tap_ref[i_tap, 0] + offy_ref[0, 0]       # (GC, TP)
    sx = base_x + tap_ref[i_tap, 1] + offx_ref[0, 0]

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, tp, h), 2).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, tp, w), 2).astype(jnp.float32)
    wy = jnp.maximum(1.0 - jnp.abs(sy[:, :, None] - iota_h), 0.0)  # (GC, TP, H)
    wx = jnp.maximum(1.0 - jnp.abs(sx[:, :, None] - iota_w), 0.0)  # (GC, TP, W)

    a = jax.lax.dot_general(wy, xg_ref[0],
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (GC, TP, W)
    s = jnp.sum(a * wx, axis=2) * msk_ref[0, 0]            # (GC, TP)
    acc_ref[...] += jax.lax.dot_general(
        s, wk_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (TP, O)

    @pl.when(jnp.logical_and(i_tap == n_tap - 1, i_g == n_g - 1))
    def _():
        out_ref[0] = acc_ref[...]


def _pallas_forward(xg, off_y, off_x, msk, weights, tap_table, *, tile_p: int,
                    group_chunk: int, interpret: bool = False):
    """xg: (B, Gp, H, W) f32; off_y/off_x/msk: (B, DK, Gp, P);
    weights: (DK, Gp, O); tap_table: (DK, 2).  Returns (B, P, O) f32 tap-sums."""
    b, gp, h, w = xg.shape
    dk = tap_table.shape[0]
    p = h * w
    o = weights.shape[-1]
    assert p % tile_p == 0, (p, tile_p)
    assert gp % group_chunk == 0, (gp, group_chunk)

    grid = (b, p // tile_p, dk, gp // group_chunk)
    op_spec = pl.BlockSpec((1, 1, group_chunk, tile_p),
                           lambda bi, pi, ti, gi: (bi, ti, gi, pi),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((dk, 2), lambda bi, pi, ti, gi: (0, 0),
                         memory_space=pltpu.VMEM),
            op_spec, op_spec, op_spec,
            pl.BlockSpec((1, group_chunk, h, w),
                         lambda bi, pi, ti, gi: (bi, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group_chunk, o),
                         lambda bi, pi, ti, gi: (ti, gi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p, o),
                               lambda bi, pi, ti, gi: (bi, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_p, o), jnp.float32)],
        interpret=interpret,
    )(tap_table.astype(jnp.float32), off_y.astype(jnp.float32),
      off_x.astype(jnp.float32), msk.astype(jnp.float32), xg,
      weights.astype(jnp.float32))


def _prep_inputs(x, offsets_list, masks_list, weights, padding_list,
                 dilation_list, kernel, deformable_groups, group_chunk):
    """Reference layouts -> kernel layouts (P minor-most; G zero-padded)."""
    b, h, w, c = x.shape
    k2 = kernel * kernel
    dg = deformable_groups
    assert c == dg, "pallas path requires cpg == 1 (OTPose case)"
    p = h * w
    d = len(offsets_list)
    gp = ((dg + group_chunk - 1) // group_chunk) * group_chunk
    pad_g = gp - dg

    # offsets (B, Ho, Wo, dg*k2*2) -> components (B, D, K2, G, P) -> (B, DK, G, P)
    off = jnp.stack([o.reshape(b, p, dg, k2, 2) for o in offsets_list], axis=1)
    off = jnp.transpose(off, (0, 1, 4, 3, 2, 5))          # (B, D, K2, G, P, 2)
    off_y = off[..., 0].reshape(b, d * k2, dg, p)
    off_x = off[..., 1].reshape(b, d * k2, dg, p)
    msk = jnp.stack([m.reshape(b, p, dg, k2) for m in masks_list], axis=1)
    msk = jnp.transpose(msk, (0, 1, 4, 3, 2)).reshape(b, d * k2, dg, p)
    wk = weights.reshape(d, k2, dg, -1).reshape(d * k2, dg, -1)
    xg = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)   # (B, G, H, W)
    if pad_g:
        off_y = jnp.pad(off_y, ((0, 0), (0, 0), (0, pad_g), (0, 0)))
        off_x = jnp.pad(off_x, ((0, 0), (0, 0), (0, pad_g), (0, 0)))
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, pad_g), (0, 0)))
        wk = jnp.pad(wk, ((0, 0), (0, pad_g), (0, 0)))
        xg = jnp.pad(xg, ((0, 0), (0, pad_g), (0, 0), (0, 0)))

    ki = np.arange(k2)
    tap = np.zeros((d * k2, 2), np.float32)
    for di, (pad, dil) in enumerate(zip(padding_list, dilation_list)):
        tap[di * k2:(di + 1) * k2, 0] = (ki // kernel) * dil - pad
        tap[di * k2:(di + 1) * k2, 1] = (ki % kernel) * dil - pad
    return off_y, off_x, msk, wk, xg, jnp.asarray(tap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _fused_core(x, off_stack, msk_stack, weights, biases,
                kernel, padding_list, dilation_list, deformable_groups,
                tile_p, group_chunk, interpret):
    d = len(padding_list)
    offsets_list = [off_stack[i] for i in range(d)]
    masks_list = [msk_stack[i] for i in range(d)]
    off_y, off_x, msk, wk, xg, tap = _prep_inputs(
        x, offsets_list, masks_list, weights, padding_list, dilation_list,
        kernel, deformable_groups, group_chunk)
    b, h, w, c = x.shape
    out = _pallas_forward(xg, off_y, off_x, msk, wk, tap, tile_p=tile_p,
                          group_chunk=group_chunk, interpret=interpret)
    out = out.reshape(b, h, w, -1) / d
    if biases is not None:
        out = out + jnp.mean(biases.astype(jnp.float32), axis=0)
    return out.astype(x.dtype)


def _xla_equiv(x, off_stack, msk_stack, weights, biases, kernel, padding_list,
               dilation_list, deformable_groups):
    d = len(padding_list)
    return dc_xla.modulated_deform_conv_multi(
        x, [off_stack[i] for i in range(d)], [msk_stack[i] for i in range(d)],
        weights, biases, kernel=kernel, stride=1,
        padding_list=tuple(padding_list), dilation_list=tuple(dilation_list),
        deformable_groups=deformable_groups)


def _fused_fwd(x, off_stack, msk_stack, weights, biases,
               kernel, padding_list, dilation_list, deformable_groups,
               tile_p, group_chunk, interpret):
    out = _fused_core(x, off_stack, msk_stack, weights, biases, kernel,
                      padding_list, dilation_list, deformable_groups, tile_p,
                      group_chunk, interpret)
    return out, (x, off_stack, msk_stack, weights, biases)


def _fused_bwd(kernel, padding_list, dilation_list, deformable_groups,
               tile_p, group_chunk, interpret, res, g):
    x, off_stack, msk_stack, weights, biases = res
    _, vjp = jax.vjp(
        lambda *a: _xla_equiv(*a, kernel=kernel, padding_list=padding_list,
                              dilation_list=dilation_list,
                              deformable_groups=deformable_groups),
        x, off_stack, msk_stack, weights, biases)
    return vjp(g)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_deform_refinement(x, offsets_list: Sequence, masks_list: Sequence,
                            weights, biases, *, kernel: int = 3,
                            padding_list=(1,), dilation_list=(1,),
                            deformable_groups: int = 1, tile_p: int = 256,
                            group_chunk: int | None = None,
                            interpret: bool = False):
    """Drop-in replacement for modulated_deform_conv_multi with the Pallas
    kernel on the forward path."""
    if group_chunk is None:
        # Mosaic requires the minor-most block dims to be full or 8/128-
        # aligned; one full (padded-to-8) group chunk satisfies both
        group_chunk = ((deformable_groups + 7) // 8) * 8
    off_stack = jnp.stack(list(offsets_list))
    msk_stack = jnp.stack(list(masks_list))
    return _fused_core(x, off_stack, msk_stack, weights, biases, kernel,
                       tuple(padding_list), tuple(dilation_list),
                       deformable_groups, tile_p, group_chunk, interpret)
