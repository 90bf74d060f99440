"""Fused attention front-end Pallas kernel for the (B, C, T) token layout.

One HBM pass computes, for a stride-1 ``masked_mhca_ct`` block,

    n      = LN_C(x)                     (ln1 pre-norm)
    q/k/v  = Wp.T @ LN_C(dwconv_k3(n, wp_dw)) + bp     (p in {q, k, v})

(ref: model/blocks.py:360-447 — query/key/value depthwise convs are
``bias=False``, the 1x1 projections carry biases; the channel-LN between
them is ``LayerNorm(n_embd)``).  The XLA path pays ~14 separate HBM passes
over the (B, C, T) activation for this fragment (ln1, three conv+LN
fusions, three projections); this kernel reads x once and writes q/k/v
once.  The attention einsums, projection, residual and the MLP tail stay
outside (the MLP tail has its own kernel, ops/pallas/fused_mlp.py).

Grid is (B, T/TT) with the T-chunk axis innermost; chunk j == 0 computes
the full ln1 row into a zero-padded VMEM scratch (chunked, to bound f32
temporaries), and every chunk then reads its +-1-token halo from that
scratch — TPU grids execute sequentially, so later chunks see the row.

Numerics mirror the XLA path: LN stats/affine in f32 rounded to the
compute dtype, depthwise conv as three shifted multiply-adds in the
compute dtype (``core.depthwise_conv1d_k3_ct``), dense matmuls with f32
accumulation rounded to the compute dtype (``blocks._dense_1x1_ct``).
Eval path only, like the fused MLP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otpose_tpu.models import core

_T_TILE = 1152


def _pick_tile(t: int, t_tile: int) -> int:
    """Largest chunk <= t_tile that divides T (whole chunks keep the halo
    bookkeeping trivial); 0 if none exists."""
    if t <= t_tile:
        return t
    if t % t_tile == 0:
        return t_tile
    for cand in range(t_tile, 127, -128):
        if cand % 128 == 0 and t % cand == 0:
            return cand
    return 0


def fused_qkv_supported(t: int) -> bool:
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
            q_ref, k_ref, v_ref, norm_scr,
            *, t: int, tt: int, eps: float, precision):
    # Mosaic requires dynamic lane offsets to be provably 128-aligned (and
    # has no bf16 lane rotate), so: the ln1 row lives in ``norm_scr`` at a
    # +128-lane offset with zeros around it, every dynamic load/store is
    # chunk-aligned (pl.multiple_of is valid because _pick_tile guarantees
    # tt % 128 == 0 whenever there is more than one chunk), the +-1-token
    # shifts are in-register concats, and the chunk-boundary halo columns
    # are one-hot lane reductions over the aligned neighbor slab.
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    dtype = q_ref.dtype
    c = norm_scr.shape[0]

    @pl.when(j == 0)
    def _():
        # fill the ln1 row in TT-wide chunks (bounds the f32 temporaries)
        norm_scr[...] = jnp.zeros(norm_scr.shape, norm_scr.dtype)

        def body(i, _):
            src = pl.multiple_of(i * tt, 128)
            xs = x_ref[0, :, pl.ds(src, tt)].astype(jnp.float32)
            norm_scr[:, pl.ds(pl.multiple_of(128 + i * tt, 128), tt)] = (
                _ln_cols(xs, ln1w_ref, ln1b_ref, eps).astype(dtype))
            return 0

        jax.lax.fori_loop(0, nj, body, 0)

    t0s = pl.multiple_of(128 + j * tt, 128)
    n0 = norm_scr[:, pl.ds(t0s, tt)]
    # re-hint: arithmetic on a multiple_of value drops the alignment fact
    left_slab = norm_scr[:, pl.ds(pl.multiple_of(t0s - 128, 128), 128)]
    # (zeros when j == 0)
    # the slab right of the last chunk can sit at an unaligned 128+T (small
    # single-chunk T); redirect it to the always-zero [0, 128) region — the
    # right halo of the final token is zero padding anyway
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

    for dw_ref, nw_ref, nb_ref, w_ref, b_ref, o_ref in (
            (dwq_ref, nqw_ref, nqb_ref, wq_ref, bq_ref, q_ref),
            (dwk_ref, nkw_ref, nkb_ref, wk_ref, bk_ref, k_ref),
            (dwv_ref, nvw_ref, nvb_ref, wv_ref, bv_ref, v_ref)):
        dw = dw_ref[...].astype(dtype)        # (C, 3)
        y = (nm1 * dw[:, 0:1] + n0 * dw[:, 1:2] + np1 * dw[:, 2:3])
        yn = _ln_cols(y.astype(jnp.float32), nw_ref, nb_ref, eps).astype(dtype)
        proj = jax.lax.dot_general(
            w_ref[...], yn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(dtype)
        o_ref[0] = proj + b_ref[...].astype(dtype)


def fused_qkv_ct(x: jnp.ndarray,
                 ln1_w, ln1_b,
                 dw_q, dw_k, dw_v,
                 nq_w, nq_b, nk_w, nk_b, nv_w, nv_b,
                 wq, bq, wk, bk, wv, bv,
                 t_tile: int | None = None,
                 interpret: bool | None = None):
    """x: (B, C, T) -> (q, k, v), each (B, C, T).

    ``dw_*`` are the stored (3, 1, C) depthwise kernels; ``w*`` the stored
    (1, C, C) projection kernels; ``b*`` their (C,) biases; the LN affines
    are (C,) and stay f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if t_tile is None:
        t_tile = _T_TILE
    return _fused_qkv_jit(x, ln1_w, ln1_b, dw_q, dw_k, dw_v,
                          nq_w, nq_b, nk_w, nk_b, nv_w, nv_b,
                          wq, bq, wk, bk, wv, bv,
                          t_tile=t_tile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def _fused_qkv_jit(x, ln1_w, ln1_b, dw_q, dw_k, dw_v,
                   nq_w, nq_b, nk_w, nk_b, nv_w, nv_b,
                   wq, bq, wk, bk, wv, bv, *, t_tile: int, interpret: bool):
    b, c, t = x.shape
    tt = _pick_tile(t, t_tile)
    if not tt:
        raise ValueError(f"fused_qkv_ct needs a chunk dividing T={t}"
                         f" (<= {t_tile}, multiple of 128)")
    nj = t // tt
    dtype = x.dtype

    col = lambda a: a.astype(jnp.float32)[:, None]          # (C,) -> (C, 1)
    dwm = lambda a: jnp.transpose(a[:, 0, :])               # (3,1,C) -> (C, 3)
    pw = lambda a: jnp.transpose(a[0]).astype(dtype)        # (1,C,C) -> (C, C)
    bb = lambda a: a.astype(dtype)[:, None]

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, c, tt), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, t=t, tt=tt, eps=core.LN_EPS,
                             precision=core._mxu_precision(dtype))
    out_sd = jax.ShapeDtypeStruct((b, c, t), dtype)
    # scratch row: 128 zero lanes, the T tokens, zero tail to the lane tile
    # plus one extra 128 slab so the right-neighbor read of any chunk
    # (offset 128 + (j+1)*tt, width 128) stays in bounds
    t_scr = 128 + ((t + 127) // 128) * 128 + 128
    return pl.pallas_call(
        kern,
        out_shape=(out_sd, out_sd, out_sd),
        grid=(b, nj),
        in_specs=[
            pl.BlockSpec((1, c, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((c, 1)), full((c, 1)),
            full((c, 3)), full((c, 3)), full((c, 3)),
            full((c, 1)), full((c, 1)), full((c, 1)), full((c, 1)),
            full((c, 1)), full((c, 1)),
            full((c, c)), full((c, 1)), full((c, c)), full((c, 1)),
            full((c, c)), full((c, 1)),
        ],
        out_specs=(blk, blk, blk),
        scratch_shapes=[pltpu.VMEM((c, t_scr), dtype)],
        interpret=interpret,
    )(x, col(ln1_w), col(ln1_b),
      dwm(dw_q).astype(dtype), dwm(dw_k).astype(dtype), dwm(dw_v).astype(dtype),
      col(nq_w), col(nq_b), col(nk_w), col(nk_b), col(nv_w), col(nv_b),
      pw(wq), bb(bq), pw(wk), bb(bk), pw(wv), bb(bv))


def fused_qkv_block_ct(ctx, x: jnp.ndarray):
    """Eval-path replacement for the ln1+q/k/v front of
    ``transformer_block_ct`` (stride 1, global attention).  Reads the same
    params as the XLA path."""
    a = ctx.sub("attn")
    return fused_qkv_ct(
        x, ctx.param("ln1.weight"), ctx.param("ln1.bias"),
        a.param("query_conv.weight"), a.param("key_conv.weight"),
        a.param("value_conv.weight"),
        a.param("query_norm.weight"), a.param("query_norm.bias"),
        a.param("key_norm.weight"), a.param("key_norm.bias"),
        a.param("value_norm.weight"), a.param("value_norm.bias"),
        a.param("query.weight"), a.param("query.bias"),
        a.param("key.weight"), a.param("key.bias"),
        a.param("value.weight"), a.param("value.bias"))
