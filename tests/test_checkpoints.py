import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.engine import checkpoints as ckpt
from otpose_tpu.engine.optim import make_optimizer, make_schedule
from otpose_tpu.engine.trainer import init_train_state
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.models.torch2jax import filter_pretrained_for_otpose
from otpose_tpu.utils.testing import tiny_otpose_cfg


@pytest.fixture(scope="module")
def ts():
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    opt = make_optimizer(params, cfg, make_schedule(cfg, 10))
    return init_train_state(params, state, opt)


def test_save_resume_roundtrip(ts, tmp_path):
    folder = str(tmp_path / "ck")
    ckpt.save_checkpoint(folder, 3, ts, tensorboard_global_steps=42)
    assert ckpt.get_latest_checkpoint(folder).endswith("epoch_3_state")
    ts2, begin_epoch, tb, start_it = ckpt.resume(folder, ts)
    assert start_it == 0
    assert begin_epoch == 4 and tb == 42
    np.testing.assert_array_equal(
        np.asarray(ts2.params["final_layer1.weight"]),
        np.asarray(ts.params["final_layer1.weight"]))


def test_latest_discovery(ts, tmp_path):
    folder = str(tmp_path / "ck")
    for e in (0, 2, 10):
        ckpt.save_checkpoint(folder, e, ts)
    assert ckpt.get_latest_checkpoint(folder).endswith("epoch_10_state")
    assert [os.path.basename(p) for p in ckpt.get_all_checkpoints(folder)] == \
        ["epoch_0_state", "epoch_2_state", "epoch_10_state"]


def test_best_checkpoint_deletion(ts, tmp_path):
    """Higher mAP replaces the previous best; lower is rejected
    (ref: model/checkpoints.py:47-74)."""
    folder = str(tmp_path / "ck")
    assert ckpt.save_best_checkpoint(folder, ts, 50.0)
    assert ckpt.save_best_checkpoint(folder, ts, 60.5)
    assert ckpt.save_best_checkpoint(folder, ts, 55.0) is None
    names = [n for n in os.listdir(folder) if n.startswith("best")]
    assert names == ["best_mAP_60.5_state"]
    assert ckpt.get_best_checkpoint(folder).endswith("best_mAP_60.5_state")


def test_torch_pth_import(tmp_path):
    torch = pytest.importorskip("torch")
    # a reference-style training checkpoint: bare HRNet keys + module. prefix
    sd = {
        "module.conv1.weight": torch.randn(8, 3, 3, 3),
        "bn1.weight": torch.ones(8),
        "bn1.running_mean": torch.zeros(8),
        "final_layer1.bias": torch.zeros(4),
    }
    path = str(tmp_path / "ref.pth")
    torch.save({"state_dict": sd, "begin_epoch": 7}, path)
    blob = ckpt.restore_checkpoint(path)
    assert blob["begin_epoch"] == 7
    assert blob["params"]["conv1.weight"].shape == (3, 3, 3, 8)  # HWIO
    assert "bn1.running_mean" in blob["model_state"]

    mapped = filter_pretrained_for_otpose(blob["params"])
    # bare HRNet keys get prefixed; known OTPose roots pass through
    assert "rough_pose_estimation_net.conv1.weight" in mapped
    assert "final_layer1.bias" in mapped


def test_merge_checkpoint_shape_gated():
    """checkpoints.merge_checkpoint: key-by-key with shape gating, returns
    the loaded count (0 must be surfaced by artifact-baking callers)."""
    import jax.numpy as jnp

    from otpose_tpu.engine.checkpoints import merge_checkpoint

    init_p = {"a.weight": jnp.zeros((2, 2)), "b.weight": jnp.zeros((3,))}
    init_s = {"a.running_mean": jnp.zeros((2,))}
    blob = {"params": {"a.weight": jnp.ones((2, 2)),      # loads
                       "b.weight": jnp.ones((4,)),        # shape mismatch
                       "c.weight": jnp.ones((1,))},       # unknown key
            "model_state": {"a.running_mean": jnp.ones((2,)),
                            "zz": jnp.ones((1,))}}
    params, state, n = merge_checkpoint(blob, init_p, init_s)
    assert n == 1
    assert float(params["a.weight"][0, 0]) == 1.0
    assert float(params["b.weight"][0]) == 0.0          # untouched
    assert float(state["a.running_mean"][0]) == 1.0
    # inputs not mutated
    assert float(init_p["a.weight"][0, 0]) == 0.0


@pytest.mark.slow
def test_sharded_save_resume_roundtrip(ts, tmp_path):
    """Multi-chip production path: a train state living on an 8-device mesh
    (params/opt replicated jax.Arrays) must save and resume, and the resumed
    leaves must carry the template's mesh sharding (restore goes through the
    live train state as orbax template, engine/checkpoints.py::resume)."""
    import dataclasses

    from otpose_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh()
    sharded = dataclasses.replace(
        ts,
        params=replicate(mesh, ts.params),
        model_state=replicate(mesh, ts.model_state),
        opt_state=replicate(mesh, ts.opt_state),
        step=replicate(mesh, ts.step))
    folder = str(tmp_path / "ck_mesh")
    ckpt.save_checkpoint(folder, 5, sharded, tensorboard_global_steps=7)
    ts2, begin_epoch, tb, start_it = ckpt.resume(folder, sharded)
    assert begin_epoch == 6 and tb == 7
    leaf = ts2.params["final_layer1.weight"]
    assert leaf.sharding.is_fully_replicated
    assert len(leaf.sharding.device_set) == mesh.devices.size
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(ts.params["final_layer1.weight"]))
    opt_leaves = jax.tree_util.tree_leaves(ts2.opt_state)
    ref_leaves = jax.tree_util.tree_leaves(ts.opt_state)
    assert len(opt_leaves) == len(ref_leaves)
    np.testing.assert_array_equal(np.asarray(opt_leaves[0]),
                                  np.asarray(ref_leaves[0]))


def test_async_save_round_trip(ts, tmp_path):
    """async_save returns before commit is guaranteed; wait_for_saves() makes
    it durable and the restored payload matches a synchronous save's."""
    folder = str(tmp_path / "ck_async")
    path = ckpt.save_checkpoint(folder, 1, ts, tensorboard_global_steps=7,
                                async_save=True)
    # a second (sync) save while the first may still be committing must not
    # race: orbax serializes saves on the persistent checkpointer
    ckpt.save_checkpoint(folder, 2, ts, tensorboard_global_steps=8)
    ckpt.wait_for_saves()
    assert os.path.isdir(path)
    assert ckpt.get_latest_checkpoint(folder).endswith("epoch_2_state")
    ts2, begin_epoch, tb, start_it = ckpt.resume(folder, ts)
    assert (begin_epoch, tb, start_it) == (3, 8, 0)
    np.testing.assert_array_equal(
        np.asarray(ts2.params["final_layer1.weight"]),
        np.asarray(ts.params["final_layer1.weight"]))
    # and the async epoch itself restores intact (restore waits for commits)
    blob = ckpt.restore_checkpoint(path)
    assert int(blob["meta"]["begin_epoch"]) == 2
    np.testing.assert_array_equal(
        np.asarray(blob["params"]["final_layer1.weight"]),
        np.asarray(ts.params["final_layer1.weight"]))


def test_parse_best_scientific_notation(tmp_path, ts):
    """A tiny early-training mAP reprs in scientific notation; the best-dir
    name must still parse so later epochs compare against and delete it."""
    from otpose_tpu.engine.checkpoints import _parse_best
    assert _parse_best("best_mAP_3.2e-05_state") == pytest.approx(3.2e-05)
    assert _parse_best("best_mAP_61.5_state") == pytest.approx(61.5)
    assert _parse_best("epoch_3_state") is None
    assert _parse_best("best_mAP_notafloat_state") is None
    # non-finite parses would make every "mAP > best" comparison false
    # forever and the stale dir immortal — rejected like unparsable names
    assert _parse_best("best_mAP_nan_state") is None
    assert _parse_best("best_mAP_inf_state") is None
    assert _parse_best("best_mAP_-inf_state") is None
    folder = str(tmp_path / "ck_sci")
    assert ckpt.save_best_checkpoint(folder, ts, 3.2e-05)
    assert ckpt.save_best_checkpoint(folder, ts, 50.0)
    names = [n for n in os.listdir(folder) if n.startswith("best")]
    assert names == ["best_mAP_50.0_state"]
