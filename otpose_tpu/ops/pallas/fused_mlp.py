"""Fused transformer-MLP Pallas kernel for the (B, C, T) token layout.

One VMEM-resident pass computes

    out = x + W2.T @ gelu(W1.T @ LN_C(x) + b1) + b2

over T tiles (ref: model/blocks.py:258-266 — the TransformerBlock "mlp"
Sequential of conv1x1 -> GELU -> Dropout -> conv1x1 -> Dropout, plus the
ln2 pre-norm and the residual add around it, ref: blocks.py:276-279).

Why a kernel: at flagship geometry (B=16, C=136, T=6912, bf16) the XLA path
materializes the (B, 4C, T) GELU intermediate (~120 MB) in HBM between the
two channel matmuls — XLA cannot fuse matmul->matmul — and pays separate
read/write passes for the LN and the residual.  That is ~390 MB of HBM
traffic per block where this kernel moves ~60 MB (read x, write out, stream
the 0.3 MB of weights once); the MXU work is unchanged.  See STATUS.md
"Round-2 perf log" for the measured effect.

Numerics mirror the XLA path exactly: LN statistics and the LN affine in
f32 then rounded to the compute dtype (``core.layer_norm_ct``), matmuls in
the compute dtype with the output dtype following the inputs
(``core._preferred``), exact erf GELU (``core.gelu``), biases cast to the
activation dtype before the add (``blocks._dense_1x1_ct``).

Used on the eval path only (dropout/drop-path are identity there; the
drop-path affine scale, when present, is folded into W2/b2 on the host
side).  Training keeps the XLA path so autodiff sees plain jnp ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otpose_tpu.models import core

# default T tile: divides the flagship token counts 6912 (stem) and 3456
# (branch 0); 1728 (branch 1) runs one padded tail tile, which Pallas masks.
_T_TILE = 1152

# Abramowitz-Stegun 7.1.26 erf polynomial (|err| < 1.5e-7): Mosaic has no
# erf/erfc lowering, so the exact-erf GELU (core.gelu, torch nn.GELU default)
# is evaluated in-kernel from this f32 polynomial.  The 1.5e-7 error is far
# below bf16 resolution (~4e-3 ulp at 1.0) and the f32 parity tolerance.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _gelu_exact(h):
    hf = h.astype(jnp.float32)
    z = hf * np.float32(1.0 / np.sqrt(2.0))
    a = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(_ERF_P) * a)
    a1, a2, a3, a4, a5 = (np.float32(v) for v in _ERF_A)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))
    return (np.float32(0.5) * hf * (1.0 + erf)).astype(h.dtype)


def _kernel(x_ref, lnw_ref, lnb_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
            o_ref, *, eps: float, precision):
    x = x_ref[0]                                   # (C, TT) compute dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=0, keepdims=True)
    res = xf - mu
    sigma = jnp.mean(res * res, axis=0, keepdims=True)
    xn = res / jnp.sqrt(sigma + eps)
    xn = (xn * lnw_ref[...] + lnb_ref[...]).astype(x.dtype)
    # Mosaic requires a 32-bit matmul accumulator; rounding the f32 result
    # to the compute dtype right after the dot is exactly what the XLA
    # path's compute-dtype-preferred einsum does (MXU accumulates f32).
    h = jax.lax.dot_general(w1t_ref[...], xn, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision).astype(x.dtype)  # (4C, TT)
    h = _gelu_exact(h + b1_ref[...].astype(x.dtype))
    y = jax.lax.dot_general(w2t_ref[...], h, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision).astype(x.dtype)  # (C, TT)
    o_ref[0] = x + (y + b2_ref[...].astype(x.dtype))


def fused_mlp_residual_ct(x: jnp.ndarray, ln_w: jnp.ndarray, ln_b: jnp.ndarray,
                          w1: jnp.ndarray, b1: jnp.ndarray,
                          w2: jnp.ndarray, b2: jnp.ndarray,
                          t_tile: int | None = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """x: (B, C, T) -> x + W2.T @ gelu(W1.T @ LN_C(x) + b1) + b2.

    ``w1``/``w2`` are the conv1d params in their stored (1, C_in, C_out)
    layout; biases are (C_out,).  ``ln_w``/``ln_b`` are the (C,) LN affine
    (kept f32, like ``core.layer_norm_ct``).  ``interpret=None`` auto-selects
    interpreter mode off-TPU so CPU tests exercise the same kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if t_tile is None:
        t_tile = _T_TILE
    return _fused_mlp_jit(x, ln_w, ln_b, w1, b1, w2, b2,
                          t_tile=t_tile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def _fused_mlp_jit(x, ln_w, ln_b, w1, b1, w2, b2, *, t_tile: int,
                   interpret: bool) -> jnp.ndarray:
    b, c, t = x.shape
    hid = w1.shape[-1]
    tt = min(t_tile, t)
    dtype = x.dtype
    grid = (b, pl.cdiv(t, tt))

    w1t = jnp.transpose(w1[0]).astype(dtype)       # (4C, C)
    w2t = jnp.transpose(w2[0]).astype(dtype)       # (C, 4C)
    b1c = b1.astype(dtype)[:, None]                # (4C, 1)
    b2c = b2.astype(dtype)[:, None]                # (C, 1)
    lnw = ln_w.astype(jnp.float32)[:, None]        # (C, 1)
    lnb = ln_b.astype(jnp.float32)[:, None]

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, eps=core.LN_EPS,
                             precision=core._mxu_precision(dtype))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, t), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, tt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            full((c, 1)), full((c, 1)),
            full((hid, c)), full((hid, 1)),
            full((c, hid)), full((c, 1)),
        ],
        out_specs=pl.BlockSpec((1, c, tt), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, lnw, lnb, w1t, b1c, w2t, b2c)


def fused_mlp_block_ct(ctx, x: jnp.ndarray) -> jnp.ndarray:
    """Eval-path replacement for the ln2+mlp tail of ``transformer_block_ct``.

    Reads the same params as the XLA path (``ln2``, ``mlp.0``, ``mlp.3``,
    optional ``drop_path_mlp.scale``).  The per-channel drop-path affine
    scale commutes with the output matmul, so it is folded into W2/b2 here
    (drop-path itself is identity at eval, ref: blocks.py:289-298).
    """
    w2 = ctx.param("mlp.3.weight")
    b2 = ctx.param("mlp.3.bias")
    if ctx.has("drop_path_mlp.scale"):
        scale = ctx.param("drop_path_mlp.scale")
        w2 = w2 * scale[None, None, :]
        b2 = b2 * scale
    return fused_mlp_residual_ct(
        x, ctx.param("ln2.weight"), ctx.param("ln2.bias"),
        ctx.param("mlp.0.weight"), ctx.param("mlp.0.bias"), w2, b2)
