import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models import blocks
from otpose_tpu.models.conv_transformer import (ConvTransformerSpec,
                                                conv_transformer_forward,
                                                init_conv_transformer)
from otpose_tpu.models.core import Ctx, max_pool1d, upsample_linear_1d
from otpose_tpu.models.rsb import chain_rsb_blocks, init_chain_rsb_blocks
from otpose_tpu.models.torch2jax import convert_state_dict

from tests.helpers.reference import import_reference_module


def _to_jax(params, state):
    return ({k: jnp.asarray(v) for k, v in params.items()},
            {k: jnp.asarray(v) for k, v in state.items()})


def test_sinusoid_encoding_matches_reference():
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    ours = blocks.get_sinusoid_encoding(50, 16)          # (1, T, C)
    ref = ref_blocks.get_sinusoid_encoding(50, 16).numpy()  # (1, C, T)
    np.testing.assert_allclose(ours[0], ref[0].T, atol=1e-6)


def test_layernorm_matches_reference():
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    torch.manual_seed(0)
    ln = ref_blocks.LayerNorm(12)
    with torch.no_grad():
        ln.weight.normal_(1.0, 0.1)
        ln.bias.normal_(0.0, 0.1)
    x = torch.randn(2, 12, 30)
    with torch.no_grad():
        y_ref = ln(x).numpy()
    from otpose_tpu.models.core import layer_norm_c
    y = layer_norm_c(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                     jnp.asarray(ln.weight.detach().numpy().reshape(-1)),
                     jnp.asarray(ln.bias.detach().numpy().reshape(-1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


def test_maxpool1d_matches_torch():
    torch = pytest.importorskip("torch")
    x = torch.randn(2, 7, 20)
    y_ref = torch.nn.MaxPool1d(3, stride=2, padding=1)(x).numpy()
    y = max_pool1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-6)


def test_upsample_linear_matches_torch():
    torch = pytest.importorskip("torch")
    x = torch.randn(2, 5, 16)
    for factor in (2, 4):
        y_ref = torch.nn.Upsample(scale_factor=factor, mode="linear")(x).numpy()
        y = upsample_linear_1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), 16 * factor)
        np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


@pytest.mark.parametrize("n_head,stride", [(2, 1), (1, 1), (2, 2)])
def test_masked_mhca_matches_reference(n_head, stride):
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    torch.manual_seed(0)
    c, t = 8, 32
    m = ref_blocks.MaskedMHCA(c, n_head, n_qx_stride=stride, n_kv_stride=stride)
    m.eval()
    x = torch.randn(2, c, t)
    with torch.no_grad():
        y_ref = m(x).numpy()
    params, state = _to_jax(*convert_state_dict(m.state_dict()))
    ctx = Ctx(params, state, train=False)
    y = blocks.masked_mhca(ctx, jnp.asarray(x.numpy().transpose(0, 2, 1)), n_head,
                           stride=stride)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_transformer_block_matches_reference(stride):
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    torch.manual_seed(1)
    c, t = 8, 32
    blk = ref_blocks.TransformerBlock(c, 2, n_ds_strides=(stride, stride),
                                      path_pdrop=0.1)
    blk.eval()
    x = torch.randn(2, c, t)
    with torch.no_grad():
        y_ref = blk(x).numpy()
    params, state = _to_jax(*convert_state_dict(blk.state_dict()))
    ctx = Ctx(params, state, train=False)
    y = blocks.transformer_block(ctx, jnp.asarray(x.numpy().transpose(0, 2, 1)), 2,
                                 ds_stride=stride, path_pdrop=0.1)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


def test_conv_transformer_matches_reference():
    torch = pytest.importorskip("torch")
    ref_cvt = import_reference_module("model.ConvVideoTransformer")
    torch.manual_seed(2)
    h, w, c = 8, 4, 6
    t = h * w
    model = ref_cvt.ConvTransformer(c, c, n_head=2, n_embd_ks=3, max_len=t,
                                    arch=(0, 2, 2), h=h, proj_pdrop=0.1,
                                    path_pdrop=0.1)
    model.eval()
    x = torch.randn(2, c, h, w)
    with torch.no_grad():
        outs_ref = [o.numpy() for o in model(x)]

    params, state = _to_jax(*convert_state_dict(model.state_dict()))
    spec = ConvTransformerSpec(n_in=c, n_embd=c, n_head=2, n_embd_ks=3, max_len=t,
                               arch=(0, 2, 2), proj_pdrop=0.1, path_pdrop=0.1)
    ctx = Ctx(params, state, train=False)
    outs = conv_transformer_forward(ctx, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                                    spec)
    assert len(outs) == len(outs_ref) == 3
    for o, o_ref in zip(outs, outs_ref):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 2, 1), o_ref, atol=1e-5)


def test_conv_transformer_init_keys_match_reference():
    torch = pytest.importorskip("torch")
    ref_cvt = import_reference_module("model.ConvVideoTransformer")
    h, c = 8, 6
    t = h * 4
    model = ref_cvt.ConvTransformer(c, c, n_head=2, n_embd_ks=3, max_len=t,
                                    arch=(0, 2, 2), h=h, proj_pdrop=0.1,
                                    path_pdrop=0.1)
    ref_params, ref_state = convert_state_dict(model.state_dict())
    spec = ConvTransformerSpec(n_in=c, n_embd=c, n_head=2, n_embd_ks=3, max_len=t,
                               arch=(0, 2, 2), proj_pdrop=0.1, path_pdrop=0.1)
    params, state = init_conv_transformer(jax.random.PRNGKey(0), spec)
    assert set(params.keys()) == set(ref_params.keys())
    assert set(state.keys()) == set(ref_state.keys())
    for k in params:
        assert params[k].shape == ref_params[k].shape, k
    np.testing.assert_allclose(np.asarray(state["pos_embd"]), ref_state["pos_embd"],
                               atol=1e-6)


def test_rsb_chain_matches_reference():
    torch = pytest.importorskip("torch")
    ref_rsb = import_reference_module("model.RSB")
    torch.manual_seed(3)
    model = ref_rsb.CHAIN_RSB_BLOCKS(12, 8, 2)
    model.eval()
    x = torch.randn(2, 12, 16, 16)
    with torch.no_grad():
        y_ref = model(x).numpy()
    params, state = _to_jax(*convert_state_dict(model.state_dict()))
    ctx = Ctx(params, state, train=False)
    y = chain_rsb_blocks(ctx, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 12, 8, 2)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref, atol=1e-5)


def test_rsb_init_keys_match_reference():
    torch = pytest.importorskip("torch")
    ref_rsb = import_reference_module("model.RSB")
    model = ref_rsb.CHAIN_RSB_BLOCKS(12, 8, 2)
    ref_params, ref_state = convert_state_dict(model.state_dict())
    params, state = init_chain_rsb_blocks(jax.random.PRNGKey(0), "", 12, 8, 2)
    assert set(params.keys()) == set(ref_params.keys())
    assert set(state.keys()) == set(ref_state.keys())
    for k in params:
        assert params[k].shape == ref_params[k].shape, k
