import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.models.losses import (joint_mse_loss, joints_mse_ohkm_loss,
                                      st_ohkw_mse_loss)

from tests.helpers.reference import import_reference_module


def _mk(rng, b=4, j=17, h=8, w=6, labeled_joints=None):
    """Predictions/targets; target peaks exactly 1.0 for 'labeled' joints."""
    ps = rng.rand(b, j, h, w).astype(np.float32)
    pt = rng.rand(b, j, h, w).astype(np.float32)
    gt = 0.8 * rng.rand(b, j, h, w).astype(np.float32)
    if labeled_joints:
        for jj in labeled_joints:
            gt[rng.randint(b), jj, rng.randint(h), rng.randint(w)] = 1.0
    wt = rng.rand(b, j, 1).astype(np.float32)
    return ps, pt, gt, wt


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


@pytest.mark.parametrize("labeled", [(), (0, 3, 5), tuple(range(17))])
def test_st_ohkw_matches_reference(rng, labeled):
    torch = pytest.importorskip("torch")
    ref_loss = import_reference_module("model.loss")
    ps, pt, gt, wt = _mk(rng, labeled_joints=labeled)
    crit = ref_loss.ST_OHKW_MSELoss(use_target_weight=True)
    with torch.no_grad():
        ref = crit(torch.from_numpy(ps), torch.from_numpy(pt),
                   torch.from_numpy(gt), torch.from_numpy(wt))
    ours = st_ohkw_mse_loss(_nhwc(ps), _nhwc(pt), _nhwc(gt), jnp.asarray(wt))
    for k in ("ohkm_loss_s", "mse_loss_s", "final_loss"):
        assert float(ours[k]) == pytest.approx(float(ref[k]), rel=1e-4), k


def test_joints_mse_ohkm_matches_reference(rng):
    torch = pytest.importorskip("torch")
    ref_loss = import_reference_module("model.loss")
    ps, _, gt, wt = _mk(rng)
    crit = ref_loss.JointsMSE_OHKMMSELoss(use_target_weight=True)
    with torch.no_grad():
        ref = crit(torch.from_numpy(ps), torch.from_numpy(gt),
                   torch.from_numpy(wt))
    ours = joints_mse_ohkm_loss(_nhwc(ps), _nhwc(gt), jnp.asarray(wt))
    for ours_k, ref_k in (("ohkm_loss", "ohkm_loss"), ("mse_loss", "mse_loss"),
                          ("final_loss", "final_loss")):
        assert float(ours[ours_k]) == pytest.approx(float(ref[ref_k]), rel=1e-4)


def test_joint_mse_matches_reference(rng):
    torch = pytest.importorskip("torch")
    ref_loss = import_reference_module("model.loss")
    ps, _, gt, wt = _mk(rng)
    crit = ref_loss.JointMSELoss(use_target_weight=True)
    with torch.no_grad():
        ref = crit(torch.from_numpy(ps), torch.from_numpy(gt),
                   torch.from_numpy(wt))
    ours = joint_mse_loss(_nhwc(ps), _nhwc(gt), jnp.asarray(wt))
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)
