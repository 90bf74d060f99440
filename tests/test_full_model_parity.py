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

OUTPUT_NAMES = ["output_heatmaps", "rough_heatmaps", "intersection", "prev_b",
                "context_encoding", "squeezed", "total_b"]


def _tiny_parity_cfg(final_kernel: int = 1):
    """The shared tiny-geometry parity cfg (16x16 heatmaps, T=256)."""
    cfg = make_hrnet_cfg(num_joints=17, width=(8, 16, 32, 64),
                         stage_modules=(1, 1, 1), final_kernel=final_kernel)
    cfg.MODEL.HEATMAP_SIZE = [16, 16]       # (w, h) -> T = 256
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    cfg.MODEL.DEFORMABLE_CONV = {"DILATION": [3, 6],
                                 "AGGREGATION_TYPE": "weighted_sum"}
    cfg.MODEL.DEFORMABLE_CONV_CH = 16
    cfg.MODEL.OFFSET_MASK_COMBINE_CONV = 1
    cfg.LOSS = {"NAME": "ST_OHKW_MSELoss", "USE_TARGET_WEIGHT": True}
    return cfg


def _assert_outputs_match(ref_out, ours, tol: float = 1e-3) -> None:
    """All 7 reference outputs vs ours (NHWC) — shape-checked, <=tol."""
    assert len(ref_out) == len(ours) == len(OUTPUT_NAMES)
    for name, r, o in zip(OUTPUT_NAMES, ref_out, ours):
        o_nchw = np.asarray(o).transpose(0, 3, 1, 2)
        r_np = r.numpy()
        assert o_nchw.shape == r_np.shape, name
        diff = np.abs(o_nchw - r_np).max()
        assert diff <= tol, f"{name}: max abs diff {diff}"


@pytest.fixture(scope="module")
def parity_pair():
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from tests.helpers.torch_otpose import build_reference_otpose

    cfg = _tiny_parity_cfg()

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

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    ours = otpose_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(margin), spec)
    _assert_outputs_match(ref_out, ours)


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

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    ours = otpose_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(margin), spec)
    _assert_outputs_match(ref_out, ours)


@pytest.mark.slow
def test_full_gradient_parity(parity_pair):
    """Training-path parity: d(total loss)/d(params) of the COMPLETE model —
    train-mode forward (batch-stats BN), the reference loss combination
    (student-teacher ST-OHKW + occlusion aux, ref: script/Common.py:122-130),
    backward through every submodule including the deformable refinement —
    must match the torch reference per parameter.  This is the strongest
    available proxy that *training* (not just inference) reproduces the
    reference: equal grads + equal optimizer (tested elsewhere) => equal
    trajectories => equal converged mAP, up to data."""
    torch = pytest.importorskip("torch")
    import copy
    import dataclasses

    import jax

    from otpose_tpu.engine.trainer import compute_losses
    from tests.helpers.reference import import_reference_module

    ref0, spec, params, state = parity_pair
    ref = copy.deepcopy(ref0)
    ref.train()
    # determinism: zero every dropout / drop-path on both sides
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if hasattr(m, "drop_prob"):
            m.drop_prob = 0.0
    spec0 = dataclasses.replace(spec, proj_pdrop=0.0, path_pdrop=0.0)

    rng = np.random.RandomState(1)
    bsz = 2
    x = rng.randn(bsz, 15, 64, 64).astype(np.float32)
    margin = np.array([[1, 1, 2, 2], [1, 0, 2, 0]], dtype=np.float32)
    target = (0.7 * rng.rand(bsz, 17, 16, 16)).astype(np.float32)
    # exercise BOTH branches of the batch-global labeled-joint quirk:
    # joints 0..7 carry an exact 1.0 peak somewhere in the batch
    for j in range(8):
        target[j % bsz, j, 3 + j % 9, 2 + j % 11] = 1.0
    weight = np.ones((bsz, 17, 1), np.float32)

    ref_loss = import_reference_module("model.loss")
    crit = ref_loss.ST_OHKW_MSELoss(use_target_weight=True)
    out = ref(torch.from_numpy(x), margin=torch.from_numpy(margin))
    output, rough, intersection, context_encoding = out[0], out[1], out[2], out[4]
    tt, wt = torch.from_numpy(target), torch.from_numpy(weight)
    losses = crit(output, rough[:bsz], tt, wt)
    occlusion = (tt + intersection) / 2
    aux = crit(context_encoding, context_encoding, occlusion, wt)
    total_ref = losses["final_loss"] + aux["final_loss"]
    total_ref.backward()
    grads_ref, _ = convert_state_dict(
        {n: p.grad for n, p in ref.named_parameters() if p.grad is not None})

    batch = {
        "inputs": jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        "margin": jnp.asarray(margin),
        "target": jnp.asarray(np.transpose(target, (0, 2, 3, 1))),
        "target_weight": jnp.asarray(weight),
    }
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    jstate = {k: jnp.asarray(v) for k, v in state.items()}

    def loss_fn(p):
        ctx = Ctx(p, jstate, train=True, rng=jax.random.PRNGKey(0))
        total, _ = compute_losses(ctx, batch, spec0, 8, True)
        return total

    total_ours, grads_ours = jax.value_and_grad(loss_fn)(jparams)
    assert float(total_ours) == pytest.approx(float(total_ref.detach()), rel=1e-6)

    assert len(grads_ref) > 100
    assert set(grads_ref).issubset(set(grads_ours))
    rels = {}
    for k, g_ref in grads_ref.items():
        g_ours = np.asarray(grads_ours[k], np.float64)
        g_ref = np.asarray(g_ref, np.float64)
        assert g_ours.shape == g_ref.shape, k
        scale = max(float(np.abs(g_ref).max()), 1e-8)
        diff = float(np.abs(g_ours - g_ref).max())
        # per-key bound: loose enough for f32 chain-rule accumulation through
        # ~30 layers (deepest stem convs measure ~0.7-6% rel depending on the
        # host's reduction order), the noise-on-zero of conv biases that feed
        # straight into BN (true gradient exactly 0, both sides emit ~1e-7
        # roundoff), and the offset convs whose grads route through the
        # piecewise tent derivative (f32-vs-f64 sampling coordinates flip
        # tent-segment membership: ~5e-6 jumps).  A real divergence (wrong
        # op/layout/branch) measures O(1) relative on the affected keys.
        assert diff <= 2e-5 + 1e-1 * scale, f"{k}: {diff} vs scale {scale}"
        if scale > 1e-6:        # exclude noise-on-zero keys from the stats
            rels[k] = diff / scale
    # the distribution must be f32-noise-shaped, not systematically off:
    # measured median 3.2e-4 .. 3.1e-3 across hosts/thread counts
    vals = np.asarray(sorted(rels.values()))
    assert len(vals) > 100
    assert float(np.median(vals)) <= 1e-2, float(np.median(vals))
    assert float(vals[int(0.9 * len(vals))]) <= 4e-2


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


@pytest.mark.slow
def test_full_forward_parity_final_kernel3():
    """FINAL_CONV_KERNEL=3 parity: exercises the non-commuted final-layer
    fallback (otpose.py: commute=False — a 3x3 final conv cannot commute
    through the branch upsample, so features are stacked to NHWC and
    convolved) against the reference's padded 3x3 final convs
    (ref: model/OTPose.py:221-233, HRNet.py final layer)."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from tests.helpers.torch_otpose import build_reference_otpose

    cfg = _tiny_parity_cfg(final_kernel=3)

    torch.manual_seed(0)
    ref = build_reference_otpose(cfg)
    ref.eval()
    params, state = convert_state_dict(ref.state_dict())
    spec = OTPoseSpec.from_cfg(cfg)
    assert spec.hrnet.final_conv_kernel == 3

    rng = np.random.RandomState(0)
    x = rng.randn(2, 15, 64, 64).astype(np.float32)
    margin = np.array([[1, 1, 2, 2], [1, 0, 2, 0]], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), margin=torch.from_numpy(margin))

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    ours = otpose_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(margin), spec)
    _assert_outputs_match(ref_out, ours)
