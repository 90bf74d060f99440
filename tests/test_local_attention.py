import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models import blocks
from otpose_tpu.models.core import Ctx
from otpose_tpu.models.torch2jax import convert_state_dict

from tests.helpers.reference import import_reference_module


@pytest.mark.parametrize("n_head,window", [(2, 5), (1, 9)])
def test_local_masked_mhca_matches_reference(n_head, window):
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    torch.manual_seed(0)
    c, t = 8, 40  # T must be divisible by 2*window_overlap in the reference
    w_ov = window // 2
    t = (t // (2 * w_ov)) * (2 * w_ov)
    m = ref_blocks.LocalMaskedMHCA(c, n_head, window_size=window)
    m.eval()
    x = torch.randn(2, c, t)
    with torch.no_grad():
        y_ref = m(x).numpy()
    params, state = convert_state_dict(m.state_dict())
    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    y = blocks.local_masked_mhca(ctx, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                                 n_head, window_size=window)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


def test_local_masked_mhca_rel_pe_matches_reference():
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    torch.manual_seed(1)
    c, t, window = 8, 24, 5
    m = ref_blocks.LocalMaskedMHCA(c, 2, window_size=window, use_rel_pe=True)
    m.eval()
    x = torch.randn(1, c, t)
    with torch.no_grad():
        y_ref = m(x).numpy()
    params, state = convert_state_dict(m.state_dict())
    assert params["rel_pe"].shape == (1, 1, 2, window)
    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    y = blocks.local_masked_mhca(ctx, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                                 2, window_size=window, use_rel_pe=True)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


def test_windowed_transformer_block_matches_reference():
    torch = pytest.importorskip("torch")
    ref_blocks = import_reference_module("model.blocks")
    torch.manual_seed(2)
    c, t, window = 8, 24, 5
    blk = ref_blocks.TransformerBlock(c, 2, mha_win_size=window)
    blk.eval()
    x = torch.randn(2, c, t)
    with torch.no_grad():
        y_ref = blk(x).numpy()
    params, state = convert_state_dict(blk.state_dict())
    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    y = blocks.transformer_block(ctx, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                                 2, mha_win_size=window)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)
