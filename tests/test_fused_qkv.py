"""Fused QKV front-end Pallas kernel parity vs the XLA path.

The kernel (ops/pallas/fused_qkv.py) replaces ln1 + the depthwise q/k/v
convs + channel-LNs + 1x1 projections of a stride-1 ``masked_mhca_ct``
block on the eval path (ref: model/blocks.py:360-447).  Interpreter mode
on CPU against the plain jnp implementation, including the multi-chunk
grid (halo handoff between T chunks) and the zero-padded T edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models import blocks, core
from otpose_tpu.models.core import Ctx
from otpose_tpu.ops.pallas.fused_qkv import fused_qkv_ct, fused_qkv_supported


def _make_block_params(c, seed=0):
    params = {}
    kg = core.KeyGen(jax.random.PRNGKey(seed))
    blocks.init_transformer_block(params, kg, "blk", c)
    return params


def _qkv_reference(params, x):
    """The exact XLA eval path for the q/k/v front-end."""
    ctx = Ctx(params, {}, train=False, fused=False).sub("blk")
    normed = ctx.layer_norm_ct("ln1", x)
    a = ctx.sub("attn")
    outs = []
    for name in ("query", "key", "value"):
        y = core.depthwise_conv1d_k3_ct(normed, a.param(f"{name}_conv.weight"))
        y = a.layer_norm_ct(f"{name}_norm", y)
        outs.append(blocks._dense_1x1_ct(a, name, y))
    return outs


def _run_kernel(params, x, t_tile):
    p = {k.split("blk.", 1)[1]: v for k, v in params.items()}
    return fused_qkv_ct(
        x, p["ln1.weight"], p["ln1.bias"],
        p["attn.query_conv.weight"], p["attn.key_conv.weight"],
        p["attn.value_conv.weight"],
        p["attn.query_norm.weight"], p["attn.query_norm.bias"],
        p["attn.key_norm.weight"], p["attn.key_norm.bias"],
        p["attn.value_norm.weight"], p["attn.value_norm.bias"],
        p["attn.query.weight"], p["attn.query.bias"],
        p["attn.key.weight"], p["attn.key.bias"],
        p["attn.value.weight"], p["attn.value.bias"],
        t_tile=t_tile, interpret=True)


@pytest.mark.parametrize("c,t,tile", [
    (8, 96, 96),     # single chunk
    (8, 96, 32),     # 3 chunks: exercises the halo handoff at boundaries
    (16, 256, 128),  # 2 chunks, lane-tile aligned
])
def test_fused_qkv_matches_xla_f32(c, t, tile):
    rng = np.random.RandomState(0)
    params = _make_block_params(c)
    x = jnp.asarray(rng.randn(2, c, t), jnp.float32)
    want = _qkv_reference(params, x)
    got = _run_kernel(params, x, tile)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_fused_qkv_bf16_close_to_xla():
    rng = np.random.RandomState(1)
    c, t = 16, 128
    params = {k: v.astype(jnp.bfloat16)
              if v.dtype == jnp.float32 and not k.endswith(("norm.weight",
                                                            "norm.bias"))
              else v for k, v in _make_block_params(c).items()}
    x = jnp.asarray(rng.randn(2, c, t), jnp.bfloat16)
    want = _qkv_reference(params, x)
    got = _run_kernel(params, x, 64)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).astype(np.float32),
                                   np.asarray(w).astype(np.float32),
                                   rtol=0.05, atol=0.05)


def test_transformer_block_ct_fully_fused_matches_unfused():
    """Whole block with both kernels on (QKV front + MLP tail) vs XLA."""
    rng = np.random.RandomState(2)
    c, t, n_head = 32, 96, 2
    params = _make_block_params(c, seed=3)
    x = jnp.asarray(rng.randn(2, c, t), jnp.float32)
    out_ref = blocks.transformer_block_ct(
        Ctx(params, {}, train=False, fused=False).sub("blk"), x, n_head)
    out_fused = blocks.transformer_block_ct(
        Ctx(params, {}, train=False, fused=True).sub("blk"), x, n_head)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_shapes():
    assert fused_qkv_supported(6912)      # flagship stem
    assert fused_qkv_supported(96)        # tiny test shapes: single chunk
    assert not fused_qkv_supported(1153 * 7)  # no 128-multiple divisor
