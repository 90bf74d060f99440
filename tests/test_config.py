import os

import pytest

from otpose_tpu.config import default_parse_args, get_cfg, get_dataset_name, setup
from otpose_tpu.config.node import CfgNode


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_defaults_basic():
    cfg = get_cfg()
    assert cfg.MODEL.NUM_JOINTS == 17
    assert cfg.TRAIN.OPTIMIZER == "AdamW"
    assert cfg.MODEL.EXTRA.is_new_allowed()


def test_base_inheritance(tmp_path):
    _write(tmp_path, "base.yaml", "MODEL:\n  SIGMA: 3\n  NUM_JOINTS: 17\nTRAIN:\n  LR: 0.01\n")
    child = _write(tmp_path, "child.yaml",
                   '_BASE_: "base.yaml"\nTRAIN:\n  LR: 0.0001\nWORKERS: 4\n')
    cfg = get_cfg()
    cfg.merge_from_file(child)
    assert cfg.MODEL.SIGMA == 3
    assert cfg.TRAIN.LR == pytest.approx(1e-4)
    assert cfg.WORKERS == 4


def test_new_allowed_extra(tmp_path):
    f = _write(tmp_path, "m.yaml",
               "MODEL:\n  EXTRA:\n    FINAL_CONV_KERNEL: 1\n    STAGE2:\n      NUM_BRANCHES: 2\n")
    cfg = get_cfg()
    cfg.merge_from_file(f)
    assert cfg.MODEL.EXTRA.FINAL_CONV_KERNEL == 1
    assert cfg.MODEL.EXTRA.STAGE2.NUM_BRANCHES == 2


def test_unknown_key_rejected(tmp_path):
    f = _write(tmp_path, "bad.yaml", "NOT_A_KEY: 3\n")
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_file(f)


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["TRAIN.LR", "0.5", "MODEL.NUM_JOINTS", "15", "TRAIN.SHUFFLE", "false"])
    assert cfg.TRAIN.LR == 0.5
    assert cfg.MODEL.NUM_JOINTS == 15
    assert cfg.TRAIN.SHUFFLE is False


def test_tuple_coercion():
    cfg = get_cfg()
    cfg.merge_from_other_cfg({"GPUS": [0, 1, 2]})
    assert cfg.GPUS == (0, 1, 2)


def test_clone_independent():
    a = get_cfg()
    b = a.clone()
    b.TRAIN.LR = 123.0
    assert a.TRAIN.LR != 123.0


def test_reference_yaml_parses_if_available(tmp_path):
    ref = "/root/reference/configs/17/model_RSN.yaml"
    if not os.path.isfile(ref):
        pytest.skip("reference configs not available")
    cfg = get_cfg()
    cfg.merge_from_file(ref)
    assert cfg.MODEL.NAME == "OTPose"
    assert list(cfg.MODEL.DEFORMABLE_CONV.DILATION) == [3, 6, 9, 12, 15]
    assert cfg.MODEL.DEFORMABLE_CONV_CH == 32
    assert cfg.MODEL.HEATMAP_SIZE == [72, 96]
    assert cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS == [48, 96, 192, 384]


def test_setup_roots_paths(tmp_path):
    f = _write(tmp_path, "c.yaml", "OUTPUT_DIR: './out'\n")
    args = default_parse_args(["--cfg", f, "--root_dir", str(tmp_path)])
    cfg = setup(args)
    assert cfg.OUTPUT_DIR == os.path.abspath(os.path.join(str(tmp_path), "./out"))


def test_dataset_name():
    cfg = get_cfg()
    cfg.DATASET.NAME = "PoseTrack"
    assert get_dataset_name(cfg) == "PoseTrack17"
    cfg.DATASET.IS_2018 = True
    assert get_dataset_name(cfg) == "PoseTrack18"


def test_inference_yaml_parses():
    """configs/17/model_RSN_inference.yaml (ref: same path) parses and keeps
    the model spec of model_RSN.yaml."""
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "17",
                                     "model_RSN_inference.yaml"))
    assert cfg.MODEL.NAME == "OTPose"
    assert list(cfg.MODEL.DEFORMABLE_CONV.DILATION) == [3, 6, 9, 12, 15]
    assert cfg.WORKERS == 8
