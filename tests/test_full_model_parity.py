"""FULL-MODEL forward parity: our TPU OTPose vs the reference torch OTPose
(CPU, CUDA deform-conv replaced by a pure-torch stand-in with identical
semantics).  This is the BASELINE.md 'heatmaps <=1e-3 max-abs-diff' gate,
exercised end-to-end through every submodule and the converted weights.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models.core import Ctx
from otpose_tpu.models.otpose import OTPoseSpec, otpose_forward
from otpose_tpu.models.torch2jax import convert_state_dict

from tests.helpers.reference import make_hrnet_cfg


@pytest.fixture(scope="module")
def parity_pair():
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from tests.helpers.torch_otpose import build_reference_otpose

    cfg = make_hrnet_cfg(num_joints=17, width=(8, 16, 32, 64),
                         stage_modules=(1, 1, 1))
    cfg.MODEL.HEATMAP_SIZE = [16, 16]       # (w, h) -> T = 256
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    cfg.MODEL.DEFORMABLE_CONV = {"DILATION": [3, 6],
                                 "AGGREGATION_TYPE": "weighted_sum"}
    cfg.MODEL.DEFORMABLE_CONV_CH = 16
    cfg.MODEL.OFFSET_MASK_COMBINE_CONV = 1
    cfg.LOSS = {"NAME": "ST_OHKW_MSELoss", "USE_TARGET_WEIGHT": True}

    torch.manual_seed(0)
    ref = build_reference_otpose(cfg)
    ref.eval()

    params, state = convert_state_dict(ref.state_dict())
    spec = OTPoseSpec.from_cfg(cfg)
    return ref, spec, params, state


def test_full_forward_parity(parity_pair):
    torch = pytest.importorskip("torch")
    ref, spec, params, state = parity_pair

    rng = np.random.RandomState(0)
    # input 4x heatmap size: 64x48 (h x w), 15 channels
    x = rng.randn(2, 15, 64, 64).astype(np.float32)
    margin = np.array([[1, 1, 2, 2], [1, 0, 2, 0]], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), margin=torch.from_numpy(margin))
    names = ["output_heatmaps", "rough_heatmaps", "intersection", "prev_b",
             "context_encoding", "squeezed", "total_b"]

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    ours = otpose_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(margin), spec)

    for name, r, o in zip(names, ref_out, ours):
        o_nchw = np.asarray(o).transpose(0, 3, 1, 2)
        r_np = r.numpy()
        assert o_nchw.shape == r_np.shape, name
        diff = np.abs(o_nchw - r_np).max()
        assert diff <= 1e-3, f"{name}: max abs diff {diff}"


@pytest.mark.slow
def test_full_forward_parity_flagship_shape():
    """The 1e-3 gate at the SHIPPED geometry: HRNet-W48 (4-block stages,
    modules 1/4/3), 384x288 input, 96x72 heatmaps (T=6912), 5 dilations
    {3,6,9,12,15} — the exact spec of configs/17/model_RSN.yaml
    (VERDICT r1 task 7a).  Batch 1 to keep the CPU run tractable."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from tests.helpers.torch_otpose import build_reference_otpose

    cfg = make_hrnet_cfg(num_joints=17, width=(48, 96, 192, 384),
                         stage_modules=(1, 4, 3))
    for s, b in (("STAGE2", 2), ("STAGE3", 3), ("STAGE4", 4)):
        cfg.MODEL.EXTRA[s]["NUM_BLOCKS"] = [4] * b
    cfg.MODEL.HEATMAP_SIZE = [72, 96]       # (w, h) -> T = 6912
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    cfg.MODEL.DEFORMABLE_CONV = {"DILATION": [3, 6, 9, 12, 15],
                                 "AGGREGATION_TYPE": "weighted_sum"}
    cfg.MODEL.DEFORMABLE_CONV_CH = 32
    cfg.MODEL.OFFSET_MASK_COMBINE_CONV = 2
    cfg.LOSS = {"NAME": "ST_OHKW_MSELoss", "USE_TARGET_WEIGHT": True}

    torch.manual_seed(0)
    ref = build_reference_otpose(cfg)
    ref.eval()
    params, state = convert_state_dict(ref.state_dict())
    spec = OTPoseSpec.from_cfg(cfg)
    assert spec.scale_arch == (0, 6, 2) and spec.flow_scale_arch == (0, 6, 0)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 15, 384, 288).astype(np.float32)
    margin = np.array([[1, 1, 2, 2]], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), margin=torch.from_numpy(margin))
    names = ["output_heatmaps", "rough_heatmaps", "intersection", "prev_b",
             "context_encoding", "squeezed", "total_b"]

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    ours = otpose_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(margin), spec)

    for name, r, o in zip(names, ref_out, ours):
        o_nchw = np.asarray(o).transpose(0, 3, 1, 2)
        r_np = r.numpy()
        assert o_nchw.shape == r_np.shape, name
        diff = np.abs(o_nchw - r_np).max()
        assert diff <= 1e-3, f"{name}: max abs diff {diff}"


def test_init_keys_match_reference_otpose(parity_pair):
    """Every parameter/buffer name and shape must line up with the torch
    reference so checkpoints convert 1:1."""
    import jax

    from otpose_tpu.models.otpose import init_otpose

    ref, spec, ref_params, ref_state = parity_pair
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    assert set(params.keys()) == set(ref_params.keys())
    assert set(state.keys()) == set(ref_state.keys())
    for k in params:
        assert tuple(params[k].shape) == tuple(ref_params[k].shape), k
