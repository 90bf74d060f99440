"""Fused channel-attention Pallas kernel parity vs the XLA path.

The kernel (ops/pallas/fused_attn.py) replaces ln1 + the depthwise q/k/v
convs + channel-LNs + 1x1 projections + the per-head channel attention of
a stride-1 ``masked_mhca_ct`` block on the eval path (ref:
model/blocks.py:360-453); only the scramble + projection + residual stay
in XLA.  Interpreter mode on CPU against the plain jnp implementation,
including the multi-chunk grid (score accumulation + v residency across T
chunks, halo handoff) and the zero-padded T edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models import blocks, core
from otpose_tpu.models.core import Ctx
from otpose_tpu.ops.pallas.fused_attn import fused_attn_ct, fused_attn_supported


def _make_block_params(c, seed=0, path_pdrop=0.0):
    params = {}
    kg = core.KeyGen(jax.random.PRNGKey(seed))
    blocks.init_transformer_block(params, kg, "blk", c, path_pdrop=path_pdrop)
    return params


def _attn_reference(params, x, n_head):
    """The exact XLA eval path up to (and including) the channel attention,
    WITHOUT the scramble/proj: ln1 + q/k/v front + per-head att @ v."""
    ctx = Ctx(params, {}, train=False, fused=False).sub("blk")
    normed = ctx.layer_norm_ct("ln1", x)
    a = ctx.sub("attn")
    qkv = []
    for name in ("query", "key", "value"):
        y = core.depthwise_conv1d_k3_ct(normed, a.param(f"{name}_conv.weight"))
        y = a.layer_norm_ct(f"{name}_norm", y)
        qkv.append(blocks._dense_1x1_ct(a, name, y))
    q, k, v = qkv
    b, c, t = q.shape
    hs = c // n_head
    scale = 1.0 / np.sqrt(hs)
    qh = q.reshape(b, n_head, hs, t)
    kh = k.reshape(b, n_head, hs, t)
    vh = v.reshape(b, n_head, hs, t)
    att = jnp.einsum("bhct,bhdt->bhcd", qh * scale, kh,
                     preferred_element_type=core._preferred(x.dtype),
                     precision=core._mxu_precision(x.dtype)).astype(jnp.float32)
    att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
    att = (att / jnp.sum(att, axis=-1, keepdims=True)).astype(x.dtype)
    out = jnp.einsum("bhcd,bhdt->bhct", att, vh,
                     preferred_element_type=core._preferred(x.dtype),
                     precision=core._mxu_precision(x.dtype)).astype(x.dtype)
    return out.reshape(b, c, t)


def _run_kernel(params, x, n_head, t_tile):
    p = {k.split("blk.", 1)[1]: v for k, v in params.items()}
    return fused_attn_ct(
        x, p["ln1.weight"], p["ln1.bias"],
        p["attn.query_conv.weight"], p["attn.key_conv.weight"],
        p["attn.value_conv.weight"],
        p["attn.query_norm.weight"], p["attn.query_norm.bias"],
        p["attn.key_norm.weight"], p["attn.key_norm.bias"],
        p["attn.value_norm.weight"], p["attn.value_norm.bias"],
        p["attn.query.weight"], p["attn.query.bias"],
        p["attn.key.weight"], p["attn.key.bias"],
        p["attn.value.weight"], p["attn.value.bias"],
        n_head, t_tile=t_tile, interpret=True)


@pytest.mark.parametrize("c,n_head,t,tile", [
    (8, 2, 96, 96),     # single chunk
    (8, 2, 96, 32),     # 3 chunks: halo handoff + score accumulation
    (16, 4, 256, 128),  # 2 chunks, lane-tile aligned
    (12, 3, 96, 96),    # hs=4: head blocks not sublane-tile aligned
])
def test_fused_attn_matches_xla_f32(c, n_head, t, tile):
    rng = np.random.RandomState(0)
    params = _make_block_params(c)
    x = jnp.asarray(rng.randn(2, c, t), jnp.float32)
    want = _attn_reference(params, x, n_head)
    got = _run_kernel(params, x, n_head, tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_attn_bf16_close_to_xla():
    rng = np.random.RandomState(1)
    c, t, n_head = 16, 128, 2
    params = {k: v.astype(jnp.bfloat16)
              if v.dtype == jnp.float32 and not k.endswith(("norm.weight",
                                                            "norm.bias"))
              else v for k, v in _make_block_params(c).items()}
    x = jnp.asarray(rng.randn(2, c, t), jnp.bfloat16)
    want = _attn_reference(params, x, n_head)
    got = _run_kernel(params, x, n_head, 64)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(want).astype(np.float32),
                               rtol=0.05, atol=0.05)


def test_transformer_block_ct_fully_fused_matches_unfused():
    """Whole block with both kernels on (attention front + MLP tail) vs XLA,
    including the scramble + proj + residual and a drop-path affine scale."""
    rng = np.random.RandomState(2)
    c, t, n_head = 32, 96, 2
    params = _make_block_params(c, seed=3, path_pdrop=0.1)
    x = jnp.asarray(rng.randn(2, c, t), jnp.float32)
    out_ref = blocks.transformer_block_ct(
        Ctx(params, {}, train=False, fused=False).sub("blk"), x, n_head,
        path_pdrop=0.1)
    out_fused = blocks.transformer_block_ct(
        Ctx(params, {}, train=False, fused=True).sub("blk"), x, n_head,
        path_pdrop=0.1)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_shapes():
    assert fused_attn_supported(6912)      # flagship stem
    assert fused_attn_supported(96)        # tiny test shapes: single chunk
    assert not fused_attn_supported(1153 * 7)  # no 128-multiple divisor


def test_pick_tile_lane_alignment():
    """Multi-chunk tiles must be 128-aligned on real Mosaic (the kernel's
    pl.multiple_of hints are only valid then); interpret mode may relax."""
    from otpose_tpu.ops.pallas.fused_attn import _pick_tile

    assert _pick_tile(6912, 1152) == 1152          # aligned divisor
    assert _pick_tile(6912, 864) == 768            # 864 divides but !%128
    assert _pick_tile(6912, 864, lane_aligned=False) == 864
    assert _pick_tile(96, 96) == 96                # single chunk: any size
    assert _pick_tile(1153 * 7, 1152) == 0         # nothing fits
