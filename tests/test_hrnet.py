import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models.core import Ctx
from otpose_tpu.models.hrnet import HRNetSpec, hrnet_forward, init_hrnet
from otpose_tpu.models.torch2jax import convert_state_dict

from tests.helpers.reference import import_reference_module, make_hrnet_cfg


def _small_cfg():
    return make_hrnet_cfg(num_joints=5, width=(8, 16, 32, 64), stage_modules=(1, 2, 1))


def test_init_and_forward_shapes():
    cfg = _small_cfg()
    spec = HRNetSpec.from_cfg(cfg)
    params, state = init_hrnet(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((2, 64, 64, 3))
    ctx = Ctx(params, state, train=False)
    y = hrnet_forward(ctx, x, spec)
    assert y.shape == (2, 16, 16, 5)


def test_forward_matches_torch_reference():
    torch = pytest.importorskip("torch")
    ref_hrnet = import_reference_module("model.HRNet")

    cfg = _small_cfg()
    torch.manual_seed(0)
    model = ref_hrnet.HRNet(cfg)
    model.eval()

    params, state = convert_state_dict(model.state_dict())
    spec = HRNetSpec.from_cfg(cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x)).numpy()

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in state.items()}, train=False)
    y = hrnet_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), spec)
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-4)


def test_init_keys_match_torch_reference():
    torch = pytest.importorskip("torch")
    ref_hrnet = import_reference_module("model.HRNet")

    cfg = _small_cfg()
    model = ref_hrnet.HRNet(cfg)
    ref_params, ref_state = convert_state_dict(model.state_dict())

    spec = HRNetSpec.from_cfg(cfg)
    params, state = init_hrnet(jax.random.PRNGKey(0), spec)

    assert set(params.keys()) == set(ref_params.keys())
    assert set(state.keys()) == set(ref_state.keys())
    for k in params:
        assert params[k].shape == ref_params[k].shape, k


def test_batchnorm_train_mode_updates_state():
    cfg = _small_cfg()
    spec = HRNetSpec.from_cfg(cfg)
    params, state = init_hrnet(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    ctx = Ctx(params, state, train=True)
    hrnet_forward(ctx, x, spec)
    new_state = ctx.finalize_state()
    assert not np.allclose(np.asarray(new_state["bn1.running_mean"]),
                           np.asarray(state["bn1.running_mean"]))


def test_batchnorm_matches_torch_train_and_eval():
    torch = pytest.importorskip("torch")
    from otpose_tpu.models.core import batch_norm

    torch.manual_seed(0)
    bn = torch.nn.BatchNorm2d(6, momentum=0.1)
    x = torch.randn(4, 6, 5, 7)
    bn.train()
    with torch.no_grad():
        y_t = bn(x)
    x_j = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    y_j, new_mean, new_var = batch_norm(
        x_j, jnp.asarray(bn.weight.detach().numpy()), jnp.asarray(bn.bias.detach().numpy()),
        jnp.zeros(6), jnp.ones(6), train=True)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
                               y_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mean), bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_var), bn.running_var.numpy(), atol=1e-5)


def test_bottleneck_stage_runs_where_reference_crashes():
    """BLOCK=BOTTLENECK stage configs: the reference's blocks_dict advertises
    support but its transition-layer channel math ignores the x4 expansion,
    so the torch forward CRASHES (channel mismatch at the stage input) — a
    latent upstream bug.  Ours is rebuilt fixed: HRNetSpec.from_cfg carries
    post-expansion channels consistently through branches, transitions, and
    fuse layers, so init emits the conv1/conv2/conv3 bottleneck keys and the
    forward runs end-to-end."""
    torch = pytest.importorskip("torch")
    ref_hrnet = import_reference_module("model.HRNet")

    cfg = _small_cfg()
    cfg.MODEL.EXTRA.STAGE2.BLOCK = "BOTTLENECK"

    # document the upstream crash this config triggers in the reference
    torch.manual_seed(0)
    model = ref_hrnet.HRNet(cfg)
    model.eval()
    with torch.no_grad(), pytest.raises(RuntimeError, match="channels"):
        model(torch.zeros(1, 3, 64, 64))

    spec = HRNetSpec.from_cfg(cfg)
    params, state = init_hrnet(jax.random.PRNGKey(0), spec)
    assert any(k.startswith("stage2.") and k.endswith("conv3.weight")
               for k in params)
    ctx = Ctx(params, state, train=False)
    y = hrnet_forward(ctx, jnp.zeros((2, 64, 64, 3)), spec)
    assert y.shape == (2, 16, 16, 5)
    assert np.isfinite(np.asarray(y)).all()
