"""End-to-end CLI integration: synthetic dataset -> train.py 1 epoch ->
checkpoints -> eval.py AP pipeline (SURVEY.md §4 integration tier)."""

import os
import os.path as osp

import numpy as np
import pytest

from otpose_tpu.config import default_parse_args
from otpose_tpu.utils.testing import tiny_otpose_cfg

from tests.helpers.synthetic_data import make_synthetic_posetrack

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    # 2 videos x 4 frames x 2 people = 16 samples: divisible by the 8-device
    # data mesh at batch-per-device 1
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(root), num_videos=2, frames_per_video=4, people_per_frame=2,
        img_w=96, img_h=96)
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.EXPERIMENT_NAME = "tiny"
    cfg.OUTPUT_DIR = str(root / "output")
    cfg.DATASET.NAME = "PoseTrack"
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir
    cfg.DATASET.COLOR_RGB = True
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    cfg.VAL.BATCH_SIZE_PER_GPU = 1
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.SAVE_MODEL_PER_EPOCH = 1
    cfg.TRAIN.PROB_HALF_BODY = 0.0
    cfg.WORKERS = 2
    cfg.PRINT_FREQ = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DONATE_STATE = False
    yaml_path = root / "tiny.yaml"
    yaml_path.write_text(cfg.dump())
    return root, str(yaml_path)


@pytest.mark.slow
def test_train_then_eval(workspace):
    root, yaml_path = workspace
    args = default_parse_args(["--cfg", yaml_path, "--root_dir", str(root)])

    from otpose_tpu.cli.train import Train

    trainer = Train(args)
    state = trainer.train()
    assert int(state.step) > 0

    ckpt_dir = trainer.checkpoints_save_folder
    names = os.listdir(ckpt_dir)
    assert any(n.startswith("epoch_") for n in names), names

    from otpose_tpu.cli.eval import Eval

    ev = Eval("validate", default_parse_args(["--cfg", yaml_path,
                                              "--root_dir", str(root)]))
    results = ev.eval()
    assert len(results) == 1
    _, name_values, mean_ap = results[0]
    assert np.isfinite(mean_ap)
    assert set(name_values.keys()) == {"Head", "Shoulder", "Elbow", "Wrist",
                                       "Hip", "Knee", "Ankle", "Mean"}


def test_decoded_eval_matches_heatmap_eval(workspace):
    """evaluate_epoch_decoded (on-device decode) must reproduce the heatmap
    path's predictions and mAP."""
    import jax

    from otpose_tpu.config import default_parse_args, setup
    from otpose_tpu.data.loader import Loader
    from otpose_tpu.data.posetrack import PoseTrackDataset
    from otpose_tpu.engine.runner import evaluate_epoch, evaluate_epoch_decoded
    from otpose_tpu.engine.trainer import make_decoded_eval_step, make_eval_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose

    root, yaml_path = workspace
    cfg = setup(default_parse_args(["--cfg", yaml_path, "--root_dir", str(root)]))
    ds = PoseTrackDataset(cfg, "validate")
    loader = Loader(ds, 4, shuffle=False, num_workers=2)
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)

    nv1, map1 = evaluate_epoch(make_eval_step(spec), params, state, loader,
                               ds, cfg, str(root / "eval_hm"))
    nv2, map2 = evaluate_epoch_decoded(make_decoded_eval_step(spec), params,
                                       state, loader, ds, cfg,
                                       str(root / "eval_dec"))
    assert map2 == pytest.approx(map1, abs=1e-6)
    for k in nv1:
        assert nv2[k] == pytest.approx(nv1[k], abs=1e-6), k


def test_sharded_eval_matches_single_device(workspace):
    """8-device mesh-sharded evaluation pins the same mAP as the default
    single-device placement (VERDICT r1 task 8)."""
    import jax

    from otpose_tpu.config import default_parse_args, setup
    from otpose_tpu.data.loader import Loader
    from otpose_tpu.data.posetrack import PoseTrackDataset
    from otpose_tpu.engine.runner import evaluate_epoch_decoded
    from otpose_tpu.engine.trainer import make_decoded_eval_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.parallel.mesh import (make_eval_shard_fn, make_mesh,
                                          replicate)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    root, yaml_path = workspace
    cfg = setup(default_parse_args(["--cfg", yaml_path, "--root_dir", str(root)]))
    ds = PoseTrackDataset(cfg, "validate")
    # batch 6 on 8 devices: every batch hits the non-divisible fallback too
    loader = Loader(ds, 6, shuffle=False, num_workers=2)
    loader8 = Loader(ds, 8, shuffle=False, num_workers=2)
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    fn = make_decoded_eval_step(spec)

    _, map1 = evaluate_epoch_decoded(fn, params, state, loader8, ds, cfg,
                                     str(root / "eval_1dev"))
    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        p8, s8 = replicate(mesh, params), replicate(mesh, state)
        _, map8 = evaluate_epoch_decoded(fn, p8, s8, loader8, ds, cfg,
                                         str(root / "eval_8dev"),
                                         shard_fn=make_eval_shard_fn(mesh))
        _, map6 = evaluate_epoch_decoded(fn, p8, s8, loader, ds, cfg,
                                         str(root / "eval_8dev_b6"),
                                         shard_fn=make_eval_shard_fn(mesh))
    assert map8 == pytest.approx(map1, abs=1e-6)
    assert map6 == pytest.approx(map1, abs=1e-6)


def test_export_cli(workspace):
    """export.py CLI: checkpoint -> serving artifact -> load with only the
    artifact dir -> run at the exported batch size."""
    import jax.numpy as jnp
    import numpy as np

    from otpose_tpu.config import default_parse_args

    root, yaml_path = workspace
    args = default_parse_args(["--cfg", yaml_path, "--root_dir", str(root)])

    from otpose_tpu.cli.export import Export

    exporter = Export(args)
    try:
        exporter.model_path()
    except FileNotFoundError:
        # standalone run: train the 1-epoch checkpoint first
        from otpose_tpu.cli.train import Train

        Train(default_parse_args(["--cfg", yaml_path,
                                  "--root_dir", str(root)])).train()
    out_dir = exporter.export(batch_size=2, out_dir=str(root / "artifact"))

    from otpose_tpu.engine.export import load_exported

    model = load_exported(out_dir)
    assert model.meta["batch_size"] == 2
    rng = np.random.RandomState(3)
    coords, maxvals, raw = model(
        jnp.asarray(rng.randn(2, 32, 32, 15), jnp.float32),
        jnp.ones((2, 4), jnp.float32))
    j = model.meta["num_joints"]
    assert coords.shape == (2, j, 2)
    assert np.isfinite(np.asarray(maxvals)).all()
