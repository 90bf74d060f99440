import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.config import get_cfg
from otpose_tpu.models.core import Ctx
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose, otpose_forward


def small_otpose_cfg():
    cfg = get_cfg()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.DEFORMABLE_CONV_CH = 16
    cfg.MODEL.OFFSET_MASK_COMBINE_CONV = 1
    cfg.MODEL.DEFORMABLE_CONV.DILATION = [3, 6]
    cfg.MODEL.DEFORMABLE_CONV.AGGREGATION_TYPE = "weighted_sum"
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    cfg.MODEL.EXTRA.PRETRAINED_LAYERS = ["*"]
    for name, branches, mods in (("STAGE2", 2, 1), ("STAGE3", 3, 1), ("STAGE4", 4, 1)):
        node = {}
        node["NUM_MODULES"] = mods
        node["NUM_BRANCHES"] = branches
        node["BLOCK"] = "BASIC"
        node["NUM_BLOCKS"] = [1] * branches
        node["NUM_CHANNELS"] = [8 * (2 ** i) for i in range(branches)]
        node["FUSE_METHOD"] = "SUM"
        cfg.MODEL.EXTRA[name] = node
    return cfg


@pytest.fixture(scope="module")
def model_and_inputs():
    cfg = small_otpose_cfg()
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 15).astype(np.float32))
    margin = jnp.asarray([[1, 1, 2, 2], [1, 0, 2, 0]], dtype=jnp.float32)
    return cfg, spec, params, state, x, margin


def test_forward_shapes(model_and_inputs):
    cfg, spec, params, state, x, margin = model_and_inputs
    ctx = Ctx(params, state, train=False)
    out = otpose_forward(ctx, x, margin, spec)
    output, rough, intersection, prev_b, context_encoding, squeezed, total_b = out
    assert output.shape == (2, 16, 16, 17)
    assert rough.shape == (10, 16, 16, 17)
    assert intersection.shape == (2, 16, 16, 17)
    assert prev_b.shape == (2, 16, 16, 17)
    assert context_encoding.shape == (2, 16, 16, 17)
    assert squeezed.shape == (2, 16, 16, 17)
    assert total_b.shape == (2, 16, 16, 17)
    assert np.isfinite(np.asarray(output)).all()


def test_occlusion_encoding_math(model_and_inputs):
    """total_b/squeezed/intersection relations (ref: OTPose.py:324-330)."""
    cfg, spec, params, state, x, margin = model_and_inputs
    ctx = Ctx(params, state, train=False)
    out = otpose_forward(ctx, x, margin, spec)
    _, rough, intersection, _, _, squeezed, total_b = out
    rough5 = np.split(np.asarray(rough), 5, axis=0)
    np.testing.assert_allclose(np.asarray(total_b), sum(rough5), atol=1e-5)
    np.testing.assert_allclose(np.asarray(squeezed),
                               np.repeat(np.asarray(total_b).sum(-1, keepdims=True),
                                         17, axis=-1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(intersection),
                               np.asarray(total_b) * np.asarray(squeezed), atol=1e-4)


def test_train_mode_runs_with_rng(model_and_inputs):
    cfg, spec, params, state, x, margin = model_and_inputs
    ctx = Ctx(params, state, train=True, rng=jax.random.PRNGKey(1))
    out = otpose_forward(ctx, x, margin, spec)
    assert np.isfinite(np.asarray(out[0])).all()
    new_state = ctx.finalize_state()
    # BN stats updated somewhere
    k = "rough_pose_estimation_net.bn1.running_mean"
    assert not np.allclose(np.asarray(new_state[k]), np.asarray(state[k]))


def test_jit_forward(model_and_inputs):
    cfg, spec, params, state, x, margin = model_and_inputs

    @jax.jit
    def fwd(params, state, x, margin):
        ctx = Ctx(params, state, train=False)
        return otpose_forward(ctx, x, margin, spec)[0]

    y = fwd(params, state, x, margin)
    y2 = fwd(params, state, x, margin)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2))


def test_margin_penalty_effect(model_and_inputs):
    """Larger margins shrink the aux-frame contribution (ref: OTPose.py:339-342)."""
    cfg, spec, params, state, x, margin = model_and_inputs
    ctx1 = Ctx(params, state, train=False)
    out_small = otpose_forward(ctx1, x, jnp.zeros((2, 4)), spec)
    ctx2 = Ctx(params, state, train=False)
    out_big = otpose_forward(ctx2, x, 100.0 * jnp.ones((2, 4)), spec)
    # prev_b = cur + (prev + pprev)/(margin+1): with huge margin it tends to cur
    rough5 = jnp.split(out_small[1], 5, axis=0)
    cur = np.asarray(rough5[0])
    diff_big = np.abs(np.asarray(out_big[3]) - cur).max()
    diff_small = np.abs(np.asarray(out_small[3]) - cur).max()
    assert diff_big < diff_small / 10


def test_final_layer_commute_matches_explicit_conv(model_and_inputs):
    """The token-space final layer (1x1 conv commuted through the linear
    branch upsampling, otpose._final_layer_ct) must equal the explicit
    stack -> NHWC -> conv2d path (ref: OTPose.py:332-338,362-369)."""
    from otpose_tpu.models import core
    from otpose_tpu.models.otpose import _final_layer_ct, _tokens_to_map

    cfg, spec, params, state, x, margin = model_and_inputs
    rng = np.random.RandomState(7)
    b, c = 2, spec.temporal_encoding_dim
    t = spec.pe_h * spec.pe_w
    # native strided branch outputs: T, T/2, T/4 (scale_arch[-1] == 2)
    feats = [jnp.asarray(rng.randn(b, c, t // (2 ** s)).astype(np.float32))
             for s in range(spec.scale_arch[-1] + 1)]
    ctx = Ctx(params, state, train=False)

    got = _final_layer_ct(ctx, "final_layer1", feats, b, spec.pe_h, spec.pe_w)

    up = [f if f.shape[-1] == t else core.upsample_linear_1d_ct(f, t)
          for f in feats]
    want = ctx.conv2d("final_layer1",
                      _tokens_to_map(up, b, spec.pe_h, spec.pe_w), padding=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
