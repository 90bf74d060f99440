"""Released-checkpoint ingestion drill (VERDICT r2 task 6).

Proves the real `.pth` path end-to-end up to the data boundary: a torch
``state_dict`` saved as an actual ``.pth`` file (with the DataParallel
``module.`` prefixes and optimizer baggage a released checkpoint carries,
ref: model/checkpoints.py:28-44) loads through ``cli/eval.Eval._load``
(restore -> merge -> prepare_eval_params) with every tensor mapped, and the
loaded params reproduce the torch forward.

ref: eval.py:97-116 (model_load), configs/17/model_RSN.yaml:54 (the released
best-mAP checkpoint this path would consume on real data).
"""

import logging
import os

import numpy as np
import pytest

from otpose_tpu.config import default_parse_args, get_cfg

from tests.helpers.reference import make_hrnet_cfg
from tests.helpers.synthetic_data import make_synthetic_posetrack


def _write_workspace(root, cfg):
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(root), num_videos=1, frames_per_video=4, people_per_frame=1,
        img_w=128, img_h=96)
    cfg.EXPERIMENT_NAME = "ingest"
    cfg.OUTPUT_DIR = str(root / "output")
    cfg.DATASET.NAME = "PoseTrack"
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir
    cfg.DATASET.COLOR_RGB = True
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    cfg.VAL.BATCH_SIZE_PER_GPU = 1
    cfg.WORKERS = 0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    yaml_path = root / "ingest.yaml"
    yaml_path.write_text(cfg.dump())
    return str(yaml_path)


def _save_released_pth(ref_model, path):
    """Save the torch model exactly like a released reference checkpoint:
    DataParallel 'module.' prefixes, optimizer state, epoch counters."""
    import torch

    sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    torch.save({
        "begin_epoch": 17,
        "state_dict": sd,
        "optimizer": {"state": {}, "param_groups": []},
        "tensorboard_global_steps": 1234,
    }, path)


def _small_cfg_pair():
    """(torch-builder cfg, full framework cfg) describing the SAME small
    model, mirroring tests/test_full_model_parity.py::parity_pair."""
    tcfg = make_hrnet_cfg(num_joints=17, width=(8, 16, 32, 64),
                          stage_modules=(1, 1, 1))
    tcfg.MODEL.HEATMAP_SIZE = [16, 16]
    tcfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    tcfg.MODEL.DEFORMABLE_CONV = {"DILATION": [3, 6],
                                  "AGGREGATION_TYPE": "weighted_sum"}
    tcfg.MODEL.DEFORMABLE_CONV_CH = 16
    tcfg.MODEL.OFFSET_MASK_COMBINE_CONV = 1
    tcfg.LOSS = {"NAME": "ST_OHKW_MSELoss", "USE_TARGET_WEIGHT": True}

    cfg = get_cfg()
    cfg.MODEL.NAME = "OTPose"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.DEFORMABLE_CONV_CH = 16
    cfg.MODEL.OFFSET_MASK_COMBINE_CONV = 1
    cfg.MODEL.DEFORMABLE_CONV.DILATION = [3, 6]
    cfg.MODEL.DEFORMABLE_CONV.AGGREGATION_TYPE = "weighted_sum"
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    cfg.MODEL.EXTRA.PRETRAINED_LAYERS = ["*"]
    for name, branches in (("STAGE2", 2), ("STAGE3", 3), ("STAGE4", 4)):
        cfg.MODEL.EXTRA[name] = {
            "NUM_MODULES": 1, "NUM_BRANCHES": branches, "BLOCK": "BASIC",
            "NUM_BLOCKS": [2] * branches,
            "NUM_CHANNELS": [8 * (2 ** i) for i in range(branches)],
            "FUSE_METHOD": "SUM"}
    return tcfg, cfg


@pytest.fixture(scope="module")
def small_ingestion(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from otpose_tpu.cli.eval import Eval

    from tests.helpers.torch_otpose import build_reference_otpose

    tcfg, cfg = _small_cfg_pair()
    torch.manual_seed(0)
    ref = build_reference_otpose(tcfg)
    ref.eval()

    root = tmp_path_factory.mktemp("ingest_small")
    yaml_path = _write_workspace(root, cfg)
    pth = str(root / "best_mAP_85.978_state.pth")
    _save_released_pth(ref, pth)

    ev = Eval("validate", default_parse_args(
        ["--cfg", yaml_path, "--root_dir", str(root)]))
    return ref, ev, pth


def test_pth_loads_fully_through_eval_load(small_ingestion, caplog):
    """Every converted tensor must land: restore -> MSRA/module strip ->
    merge -> prepare_eval_params, values bit-exact vs convert_state_dict."""
    from otpose_tpu.models.torch2jax import convert_state_dict

    ref, ev, pth = small_ingestion
    with caplog.at_level(logging.INFO, logger="otpose_tpu.cli.eval"):
        params, model_state = ev._load(pth)
    exp_params, exp_state = convert_state_dict(ref.state_dict())

    assert set(params) == set(exp_params)
    for k in exp_params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(exp_params[k]), err_msg=k)
    for k in exp_state:
        np.testing.assert_array_equal(np.asarray(model_state[k]),
                                      np.asarray(exp_state[k]), err_msg=k)
    # the "loaded n/total tensors" log must report a FULL load
    msgs = [r.getMessage() for r in caplog.records if "loaded" in r.getMessage()]
    assert msgs and f"loaded {len(exp_params)}/{len(exp_params)}" in msgs[-1], msgs


@pytest.mark.slow
def test_pth_forward_parity_through_eval_load(small_ingestion):
    """The params coming out of Eval._load reproduce the torch forward
    (<=1e-3, the BASELINE gate) — the released-checkpoint eval path works."""
    import torch

    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.otpose import otpose_forward

    ref, ev, pth = small_ingestion
    params, model_state = ev._load(pth)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 15, 64, 64).astype(np.float32)
    margin = np.array([[1, 1, 2, 2]], dtype=np.float32)
    with torch.no_grad():
        ref_hm = ref(torch.from_numpy(x),
                     margin=torch.from_numpy(margin))[0].numpy()

    ctx = Ctx({k: jnp.asarray(v) for k, v in params.items()},
              {k: jnp.asarray(v) for k, v in model_state.items()}, train=False)
    ours = otpose_forward(ctx, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          jnp.asarray(margin), ev.spec)[0]
    diff = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - ref_hm).max()
    assert diff <= 1e-3, diff


def test_msra_prefix_strip_through_eval_load(small_ingestion, tmp_path):
    """--PE_Name MSRA strips the 'rough_pose_estimation_net.' prefix at load
    (ref: eval.py:109-111); the same checkpoint then loads fully."""
    import torch

    from otpose_tpu.models.torch2jax import convert_state_dict

    ref, ev, _ = small_ingestion
    pth = str(tmp_path / "msra_state.pth")
    sd = {"module.rough_pose_estimation_net." + k: v
          for k, v in ref.state_dict().items()}
    torch.save({"state_dict": sd}, pth)

    # without MSRA the prefix keeps every key unknown — and a 0-tensor
    # match is now a loud error (evaluating random init silently reports
    # garbage mAP), not a warning
    ev.pe_name = "OTPOSE"
    with pytest.raises(ValueError, match="matched 0"):
        ev._load(pth)
    # with MSRA: full load
    ev.pe_name = "MSRA"
    params, _ = ev._load(pth)
    exp_params, _ = convert_state_dict(ref.state_dict())
    for k in exp_params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(exp_params[k]), err_msg=k)


def test_posetransformer_pe_name_is_rejected(tmp_path):
    """Silently running OTPOSE under --PE_Name POSETRANSFORMER would be a
    lie; the broken reference branch is rejected loudly
    (ref: script/Common.py:119-120)."""
    from otpose_tpu.engine.base import RunBase

    args = default_parse_args(["--PE_Name", "PoseTransformer",
                               "--root_dir", str(tmp_path)])
    with pytest.raises(NotImplementedError, match="POSETRANSFORMER"):
        RunBase("validate", args=args, cfg=get_cfg())


@pytest.mark.slow
def test_flagship_pth_loads_fully_through_eval_load(tmp_path):
    """The drill at the SHIPPED geometry: a flagship-spec (HRNet-W48,
    5-dilation) torch state_dict saved as a real .pth loads through
    Eval._load with every tensor mapped — the released 85.978-mAP checkpoint
    (configs/17/model_RSN.yaml:54) would take exactly this path."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from otpose_tpu.cli.eval import Eval
    from otpose_tpu.models.torch2jax import convert_state_dict
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    from tests.helpers.torch_otpose import build_reference_otpose

    tcfg = make_hrnet_cfg(num_joints=17, width=(48, 96, 192, 384),
                          stage_modules=(1, 4, 3))
    for s, b in (("STAGE2", 2), ("STAGE3", 3), ("STAGE4", 4)):
        tcfg.MODEL.EXTRA[s]["NUM_BLOCKS"] = [4] * b
    tcfg.MODEL.HEATMAP_SIZE = [72, 96]
    tcfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    tcfg.MODEL.DEFORMABLE_CONV = {"DILATION": [3, 6, 9, 12, 15],
                                  "AGGREGATION_TYPE": "weighted_sum"}
    tcfg.MODEL.DEFORMABLE_CONV_CH = 32
    tcfg.MODEL.OFFSET_MASK_COMBINE_CONV = 2
    tcfg.LOSS = {"NAME": "ST_OHKW_MSELoss", "USE_TARGET_WEIGHT": True}
    torch.manual_seed(0)
    ref = build_reference_otpose(tcfg)

    cfg = flagship_otpose_cfg()
    yaml_path = _write_workspace(tmp_path, cfg)
    pth = str(tmp_path / "best_mAP_85.978_state.pth")
    _save_released_pth(ref, pth)

    ev = Eval("validate", default_parse_args(
        ["--cfg", yaml_path, "--root_dir", str(tmp_path)]))
    params, model_state = ev._load(pth)
    exp_params, exp_state = convert_state_dict(ref.state_dict())
    assert set(params) == set(exp_params)
    assert set(model_state) == set(exp_state)
    mismatched = [k for k in exp_params
                  if not np.array_equal(np.asarray(params[k]),
                                        np.asarray(exp_params[k]))]
    assert not mismatched, mismatched[:10]


def test_convert_state_dict_channel_param_gate_is_owner_scoped():
    """The (1,C,1)->(C,) flatten must key on the OWNING module component
    (ln1/embd_norm/drop_path_*/scale), not a substring of the full dotted
    path: a genuine out=1,k=1 conv1d under a 'scale_head' branch shares the
    shape and must take the (O,I,K)->(K,I,O) transpose (ADVICE r4)."""
    from otpose_tpu.models.torch2jax import convert_state_dict

    sd = {
        "temporal_encoder1.blocks.0.ln1.weight": np.arange(4.0).reshape(1, 4, 1),
        "temporal_encoder1.blocks.0.drop_path_attn.scale": np.full((1, 4, 1), 0.5),
        "flow_encoder.embd_norm.bias": np.zeros((1, 4, 1)),
        # adversarial: module path contains 'scale' but the param is a conv
        "scale_head.proj.weight": np.arange(4.0).reshape(1, 4, 1),
    }
    params, state = convert_state_dict(sd)
    assert params["temporal_encoder1.blocks.0.ln1.weight"].shape == (4,)
    assert params["temporal_encoder1.blocks.0.drop_path_attn.scale"].shape == (4,)
    assert params["flow_encoder.embd_norm.bias"].shape == (4,)
    # conv1d (O=1, I=4, K=1) -> (K=1, I=4, O=1), NOT flattened
    conv = params["scale_head.proj.weight"]
    assert conv.shape == (1, 4, 1)
    np.testing.assert_array_equal(conv[0, :, 0], np.arange(4.0))
