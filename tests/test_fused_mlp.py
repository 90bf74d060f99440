"""Fused transformer-MLP Pallas kernel parity vs the XLA path.

The kernel (ops/pallas/fused_mlp.py) replaces the ln2+mlp+residual tail of
``transformer_block_ct`` on the eval path (ref: model/blocks.py:258-279).
These tests run it in Pallas interpreter mode on CPU against the plain jnp
implementation, including the padded-tail grid (T not divisible by the T
tile), the flow-encoder channel count (C=17), and the drop-path scale fold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models import blocks, core
from otpose_tpu.models.core import Ctx
from otpose_tpu.ops.pallas.fused_mlp import fused_mlp_residual_ct


def _mlp_reference(x, ln_w, ln_b, w1, b1, w2, b2, scale=None):
    """The exact XLA eval path: layer_norm_ct + two _dense_1x1_ct + gelu."""
    h = core.layer_norm_ct(x, ln_w, ln_b)
    h = jnp.einsum("bct,cd->bdt", h, w1[0].astype(h.dtype)) + b1.astype(x.dtype)[:, None]
    h = core.gelu(h)
    h = jnp.einsum("bct,cd->bdt", h, w2[0].astype(h.dtype)) + b2.astype(x.dtype)[:, None]
    if scale is not None:
        h = h * scale.astype(h.dtype)[:, None]
    return x + h


def _make_params(rng, c, dtype=jnp.float32):
    return dict(
        ln_w=jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32),
        ln_b=jnp.asarray(0.1 * rng.randn(c), jnp.float32),
        w1=jnp.asarray(rng.randn(1, c, 4 * c) / np.sqrt(c), dtype),
        b1=jnp.asarray(0.1 * rng.randn(4 * c), dtype),
        w2=jnp.asarray(rng.randn(1, 4 * c, c) / np.sqrt(4 * c), dtype),
        b2=jnp.asarray(0.1 * rng.randn(c), dtype),
    )


@pytest.mark.parametrize("c,t,tile", [
    (8, 64, 32),      # tile divides T
    (8, 200, 128),    # padded tail tile
    (17, 96, 128),    # flow-encoder channel count, single padded tile
])
def test_fused_mlp_matches_xla_f32(c, t, tile):
    rng = np.random.RandomState(0)
    p = _make_params(rng, c)
    x = jnp.asarray(rng.randn(2, c, t), jnp.float32)
    want = _mlp_reference(x, **p)
    got = fused_mlp_residual_ct(x, p["ln_w"], p["ln_b"], p["w1"], p["b1"],
                                p["w2"], p["b2"], t_tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_bf16_close_to_xla():
    rng = np.random.RandomState(1)
    c, t = 16, 160
    p = _make_params(rng, c, jnp.bfloat16)
    x = jnp.asarray(rng.randn(2, c, t), jnp.bfloat16)
    want = _mlp_reference(x, **p).astype(jnp.float32)
    got = fused_mlp_residual_ct(x, p["ln_w"], p["ln_b"], p["w1"], p["b1"],
                                p["w2"], p["b2"], t_tile=128,
                                interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_transformer_block_ct_fused_matches_unfused():
    """Full block: fused Ctx vs default Ctx, incl. drop-path scale folding."""
    rng = np.random.RandomState(2)
    # c >= 32: below that the block-level gate keeps the XLA path and this
    # test would compare XLA against itself
    c, t, n_head = 32, 96, 2
    params = {}
    kg = core.KeyGen(jax.random.PRNGKey(0))
    blocks.init_transformer_block(params, kg, "blk", c, path_pdrop=0.1)
    assert "blk.drop_path_mlp.scale" in params
    # non-trivial scale so the fold is actually exercised
    params["blk.drop_path_mlp.scale"] = jnp.asarray(
        1.0 + 0.5 * rng.randn(c), jnp.float32)
    x = jnp.asarray(rng.randn(2, c, t), jnp.float32)

    out_ref = blocks.transformer_block_ct(
        Ctx(params, {}, train=False, fused=False).sub("blk"), x, n_head,
        path_pdrop=0.1)
    out_fused = blocks.transformer_block_ct(
        Ctx(params, {}, train=False, fused=True).sub("blk"), x, n_head,
        path_pdrop=0.1)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_train_ctx_never_fuses():
    """fused=True + train=True must resolve to the XLA path (autodiff)."""
    ctx = Ctx({}, {}, train=True, fused=True)
    assert not ctx.fused
