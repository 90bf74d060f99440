"""Fused channel-attention Pallas kernel for the (B, C, T) token layout.

One kernel computes, for a stride-1 ``masked_mhca_ct`` block,

    n       = LN_C(x)                                  (ln1 pre-norm)
    q/k/v   = Wp.T @ LN_C(dwconv_k3(n, wp_dw)) + bp    (p in {q, k, v})
    S_h     = (q_h / sqrt(hs)) @ k_h.T                 (per-head channel scores)
    att_h   = softmax(S_h, axis=-1)                    (f32, in-kernel)
    out_h   = att_h @ v_h

and writes only ``out`` (B, C, T) — the PRE-scramble attention output, laid
out as the contiguous (B, nh*hs, T) view of (B, nh, hs, T).  q, k and v
never touch HBM: the MaskedMHCA quirk attends over the per-head *channel*
axis (ref: model/blocks.py:427-447), so the score matrix is a tiny
(hs x hs) per head and can be accumulated in a VMEM scratch across T
chunks, with v kept VMEM-resident for the second pass.

The reference's scrambled re-assembly (ref: blocks.py:447) interleaves
tokens and channels ((B, nh, hs, T) -> transpose -> row-major view as
(B, C, T)), which is a lane<->sublane reshuffle Mosaic cannot express as a
cheap reshape — so the scramble, the 1x1 projection and the residual stay
in XLA (see ``blocks.transformer_block_ct``).

HBM traffic per block at flagship geometry (B=16, C=136, T=6912, bf16):
read x (30 MB) + write out (30 MB), vs ~330 MB for the XLA path and
~270 MB for the previous fused-QKV kernel + XLA attention tail (q/k/v
round-trips and the score einsum reads).

Grid is (B, 2, T/TT): phase 0 streams T chunks computing q/k/v, adding the
chunk's score contribution into an f32 scratch and parking the v chunk in
VMEM; phase 1 softmaxes the scores once, then streams T chunks again
emitting att @ v.  TPU grids execute sequentially, so phase 1 sees the
complete scores.  Cross-head score entries are computed (one full (C, C)
matmul instead of nh (hs, hs) ones — hs=68 is not sublane-tile aligned, so
per-head slices would relayout every chunk) and masked to zero before the
out matmul, where they then contribute nothing.

Numerics mirror the XLA path: LN stats/affine in f32 rounded to the
compute dtype, depthwise conv as three shifted multiply-adds in the
compute dtype, dense matmuls with f32 accumulation rounded to the compute
dtype, q scaled by 1/sqrt(hs) in the compute dtype before the score
matmul, softmax in f32, attention weights rounded to the compute dtype
before the out matmul (``blocks._mhca_tail_ct``).  Eval path only, like
the fused MLP (training keeps plain jnp for autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otpose_tpu.models import core

_T_TILE = 1152


def _pick_tile(t: int, t_tile: int, *, lane_aligned: bool = True) -> int:
    """Largest chunk <= t_tile that divides T (whole chunks keep the halo
    bookkeeping trivial); 0 if none exists.

    ``lane_aligned`` enforces tt % 128 == 0 for multi-chunk grids — the
    kernel's ``pl.multiple_of(..., 128)`` hints are only true then, and a
    misaligned multi-chunk tile on real Mosaic would miscompile the dynamic
    slices.  Interpreter mode (CPU tests) may relax it to exercise the halo
    logic with small chunks."""
    if t <= t_tile:
        return t
    if t % t_tile == 0 and (t_tile % 128 == 0 or not lane_aligned):
        return t_tile
    # snap to the 128-lane grid, then take the largest aligned divisor
    for cand in range((t_tile // 128) * 128, 127, -128):
        if t % cand == 0:
            return cand
    return 0


def fused_attn_supported(t: int) -> bool:
    return _pick_tile(t, _T_TILE) > 0


def _ln_cols(xf, w_ref, b_ref, eps):
    """Channel-LN over axis 0 of an f32 (C, n) tile; returns f32."""
    mu = jnp.mean(xf, axis=0, keepdims=True)
    res = xf - mu
    sigma = jnp.mean(res * res, axis=0, keepdims=True)
    return (res / jnp.sqrt(sigma + eps)) * w_ref[...] + b_ref[...]


def _kernel(x_ref, ln1w_ref, ln1b_ref,
            dwq_ref, dwk_ref, dwv_ref,
            nqw_ref, nqb_ref, nkw_ref, nkb_ref, nvw_ref, nvb_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            o_ref, norm_scr, v_scr, s_scr, att_scr,
            *, t: int, tt: int, n_head: int, eps: float, precision):
    # Mosaic requires dynamic lane offsets to be provably 128-aligned (and
    # has no bf16 lane rotate), so: the ln1 row lives in ``norm_scr`` at a
    # +128-lane offset with zeros around it, every dynamic load/store is
    # chunk-aligned (pl.multiple_of is valid because _pick_tile guarantees
    # tt % 128 == 0 whenever there is more than one chunk), the +-1-token
    # shifts are in-register concats, and the chunk-boundary halo columns
    # are one-hot lane reductions over the aligned neighbor slab.
    p = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    dtype = o_ref.dtype
    c = norm_scr.shape[0]
    hs = c // n_head
    scale = jnp.asarray(1.0 / np.sqrt(hs), dtype)

    @pl.when((p == 0) & (j == 0))
    def _():
        # fill the ln1 row in TT-wide chunks (bounds the f32 temporaries)
        norm_scr[...] = jnp.zeros(norm_scr.shape, norm_scr.dtype)
        s_scr[...] = jnp.zeros(s_scr.shape, s_scr.dtype)

        def body(i, _):
            src = pl.multiple_of(i * tt, 128)
            xs = x_ref[0, :, pl.ds(src, tt)].astype(jnp.float32)
            norm_scr[:, pl.ds(pl.multiple_of(128 + i * tt, 128), tt)] = (
                _ln_cols(xs, ln1w_ref, ln1b_ref, eps).astype(dtype))
            return 0

        jax.lax.fori_loop(0, nj, body, 0)

    @pl.when(p == 0)
    def _():
        t0s = pl.multiple_of(128 + j * tt, 128)
        n0 = norm_scr[:, pl.ds(t0s, tt)]
        # re-hint: arithmetic on a multiple_of value drops the alignment fact
        left_slab = norm_scr[:, pl.ds(pl.multiple_of(t0s - 128, 128), 128)]
        # (zeros when j == 0)
        # the slab right of the last chunk can sit at an unaligned 128+T
        # (small single-chunk T); redirect it to the always-zero [0, 128)
        # region — the right halo of the final token is zero padding anyway
        right_off = pl.multiple_of(
            jnp.where(j == nj - 1, 0, 128 + (j + 1) * tt), 128)
        right_slab = norm_scr[:, pl.ds(right_off, 128)]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
        left_col = jnp.sum(
            jnp.where(lanes == 127, left_slab.astype(jnp.float32), 0.0),
            axis=1, keepdims=True).astype(dtype)
        right_col = jnp.sum(
            jnp.where(lanes == 0, right_slab.astype(jnp.float32), 0.0),
            axis=1, keepdims=True).astype(dtype)
        nm1 = jnp.concatenate([left_col, n0[:, :-1]], axis=1)  # normed[t-1]
        np1 = jnp.concatenate([n0[:, 1:], right_col], axis=1)  # normed[t+1]

        qkv = []
        for dw_ref, nw_ref, nb_ref, w_ref, b_ref in (
                (dwq_ref, nqw_ref, nqb_ref, wq_ref, bq_ref),
                (dwk_ref, nkw_ref, nkb_ref, wk_ref, bk_ref),
                (dwv_ref, nvw_ref, nvb_ref, wv_ref, bv_ref)):
            dw = dw_ref[...].astype(dtype)        # (C, 3)
            y = (nm1 * dw[:, 0:1] + n0 * dw[:, 1:2] + np1 * dw[:, 2:3])
            yn = _ln_cols(y.astype(jnp.float32), nw_ref, nb_ref, eps).astype(dtype)
            proj = jax.lax.dot_general(
                w_ref[...], yn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision).astype(dtype)
            qkv.append(proj + b_ref[...].astype(dtype))
        q, k, v = qkv

        v_scr[:, pl.ds(pl.multiple_of(j * tt, 128), tt)] = v
        # score contribution: one (C, C) matmul; cross-head entries are
        # masked after the softmax
        s_scr[...] += jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when((p == 1) & (j == 0))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        same_head = (rows // hs) == (cols // hs)
        # the XLA path's score einsum rounds to the compute dtype before the
        # f32 softmax (core._preferred); mirror that rounding here
        s = s_scr[...].astype(dtype).astype(jnp.float32)
        s = jnp.where(same_head, s, -jnp.inf)
        s = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
        att_scr[...] = (s / jnp.sum(s, axis=1, keepdims=True)).astype(dtype)

    @pl.when(p == 1)
    def _():
        vj = v_scr[:, pl.ds(pl.multiple_of(j * tt, 128), tt)]
        o_ref[0] = jax.lax.dot_general(
            att_scr[...], vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(dtype)


def fused_attn_ct(x: jnp.ndarray,
                  ln1_w, ln1_b,
                  dw_q, dw_k, dw_v,
                  nq_w, nq_b, nk_w, nk_b, nv_w, nv_b,
                  wq, bq, wk, bk, wv, bv,
                  n_head: int,
                  t_tile: int | None = None,
                  interpret: bool | None = None) -> jnp.ndarray:
    """x: (B, C, T) -> pre-scramble attention output (B, C, T).

    ``dw_*`` are the stored (3, 1, C) depthwise kernels; ``w*`` the stored
    (1, C, C) projection kernels; ``b*`` their (C,) biases; the LN affines
    are (C,) and stay f32.  The result is the contiguous (B, nh*hs, T) view
    of the per-head ``att @ v`` — apply the reference scramble + projection
    outside (``blocks.transformer_block_ct``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if t_tile is None:
        t_tile = _T_TILE
    return _fused_attn_jit(x, ln1_w, ln1_b, dw_q, dw_k, dw_v,
                           nq_w, nq_b, nk_w, nk_b, nv_w, nv_b,
                           wq, bq, wk, bk, wv, bv,
                           n_head=n_head, t_tile=t_tile, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "t_tile", "interpret"))
def _fused_attn_jit(x, ln1_w, ln1_b, dw_q, dw_k, dw_v,
                    nq_w, nq_b, nk_w, nk_b, nv_w, nv_b,
                    wq, bq, wk, bk, wv, bv, *, n_head: int, t_tile: int,
                    interpret: bool):
    b, c, t = x.shape
    if c % n_head:
        raise ValueError(f"C={c} not divisible by n_head={n_head}")
    tt = _pick_tile(t, t_tile, lane_aligned=not interpret)
    if not tt:
        raise ValueError(f"fused_attn_ct needs a chunk dividing T={t}"
                         f" (<= {t_tile}, multiple of 128)")
    nj = t // tt
    dtype = x.dtype

    col = lambda a: a.astype(jnp.float32)[:, None]          # (C,) -> (C, 1)
    dwm = lambda a: jnp.transpose(a[:, 0, :])               # (3,1,C) -> (C, 3)
    pw = lambda a: jnp.transpose(a[0]).astype(dtype)        # (1,C,C) -> (C, C)
    bb = lambda a: a.astype(dtype)[:, None]

    full = lambda shape: pl.BlockSpec(shape, lambda i, p, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, t=t, tt=tt, n_head=n_head,
                             eps=core.LN_EPS,
                             precision=core._mxu_precision(dtype))
    # scratch row: 128 zero lanes, the T tokens, zero tail to the lane tile
    # plus one extra 128 slab so the right-neighbor read of any chunk
    # (offset 128 + (j+1)*tt, width 128) stays in bounds
    t_pad = ((t + 127) // 128) * 128
    t_scr = 128 + t_pad + 128
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, t), dtype),
        grid=(b, 2, nj),
        in_specs=[
            pl.BlockSpec((1, c, t), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((c, 1)), full((c, 1)),
            full((c, 3)), full((c, 3)), full((c, 3)),
            full((c, 1)), full((c, 1)), full((c, 1)), full((c, 1)),
            full((c, 1)), full((c, 1)),
            full((c, c)), full((c, 1)), full((c, c)), full((c, 1)),
            full((c, c)), full((c, 1)),
        ],
        # during phase 0 nothing is written: park the (revisited) block at
        # j=0 so only one stale flush can occur, and phase 1's first step
        # overwrites it before the first real flush
        out_specs=pl.BlockSpec((1, c, tt), lambda i, p, j: (i, 0, j * p),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, t_scr), dtype),     # ln1 row + halo
                        pltpu.VMEM((c, t_pad), dtype),     # v, resident
                        pltpu.VMEM((c, c), jnp.float32),   # score accum
                        pltpu.VMEM((c, c), dtype)],        # softmaxed att
        interpret=interpret,
    )(x, col(ln1_w), col(ln1_b),
      dwm(dw_q).astype(dtype), dwm(dw_k).astype(dtype), dwm(dw_v).astype(dtype),
      col(nq_w), col(nq_b), col(nk_w), col(nk_b), col(nv_w), col(nv_b),
      pw(wq), bb(bq), pw(wk), bb(bk), pw(wv), bb(bv))


def fused_attn_block_ct(ctx, x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """Eval-path replacement for ln1 + q/k/v + channel attention of a
    stride-1 ``transformer_block_ct`` (global attention).  Reads the same
    params as the XLA path; returns the pre-scramble ``att @ v``."""
    a = ctx.sub("attn")
    return fused_attn_ct(
        x, ctx.param("ln1.weight"), ctx.param("ln1.bias"),
        a.param("query_conv.weight"), a.param("key_conv.weight"),
        a.param("value_conv.weight"),
        a.param("query_norm.weight"), a.param("query_norm.bias"),
        a.param("key_norm.weight"), a.param("key_norm.bias"),
        a.param("value_norm.weight"), a.param("value_norm.bias"),
        a.param("query.weight"), a.param("query.bias"),
        a.param("key.weight"), a.param("key.bias"),
        a.param("value.weight"), a.param("value.bias"),
        n_head)
