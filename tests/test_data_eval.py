import json
import os.path as osp

import numpy as np
import pytest

from otpose_tpu.config import get_cfg
from otpose_tpu.data.posetrack import PoseTrackDataset
from otpose_tpu.evaluate import poseval
from otpose_tpu.evaluate.converters import convert_videos, video2filenames
from otpose_tpu.evaluate.keypoints import PT15_FROM_COCO17

from tests.helpers.synthetic_data import make_synthetic_posetrack

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(str(root))
    return json_dir, img_dir, annot_dir


def _cfg_for(json_dir, img_dir, annot_dir):
    cfg = get_cfg()
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [72, 96]
    cfg.MODEL.HEATMAP_SIZE = [18, 24]
    cfg.MODEL.SIGMA = 2
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir
    cfg.DATASET.COLOR_RGB = True
    cfg.DATASET.NAME = "PoseTrack"
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    cfg.TRAIN.PROB_HALF_BODY = 0.0
    return cfg


def test_dataset_indexing(synth):
    json_dir, img_dir, annot_dir = synth
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    ds = PoseTrackDataset(cfg, "train")
    # 2 videos x 5 frames x 2 people
    assert len(ds) == 20
    rec = ds.data[0]
    assert rec["joints_3d"].shape == (17, 3)
    assert rec["nframes"] == 5


def test_window_selection_quirks(synth):
    json_dir, img_dir, annot_dir = synth
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    ds = PoseTrackDataset(cfg, "train")
    # middle frame (PT17 1-based index 3 of 5): prev/next both have 2 options
    rec = next(r for r in ds.data if r["frame_id"] == 3)
    win = ds.select_window(rec["image"], rec["nframes"])
    cur, prev, nxt, pprev, nnext = win["files"]
    assert prev.endswith("00000002.jpg")
    assert nxt.endswith("00000004.jpg")
    assert pprev.endswith("00000001.jpg")   # genuinely 2 back
    assert nnext == nxt                     # reference quirk: nnext == next
    assert win["margins"] == [1, 1, 2, 1]

    # first frame: no prev
    rec = next(r for r in ds.data if r["frame_id"] == 1)
    win = ds.select_window(rec["image"], rec["nframes"])
    assert win["files"][1] == win["files"][0]
    assert win["margins"][0] == 0


def test_host_sample_shapes(synth):
    json_dir, img_dir, annot_dir = synth
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    ds = PoseTrackDataset(cfg, "validate")
    s = ds.get_sample_host(0)
    assert s["inputs"].shape == (96, 72, 15)
    assert s["target"].shape == (24, 18, 17)
    assert s["target_weight"].shape == (17, 1)
    assert s["margin"].shape == (4,)
    # gaussian targets peak at 1.0 for visible joints
    visible = s["target_weight"][:, 0] > 0
    assert s["target"].transpose(2, 0, 1)[visible].max() == pytest.approx(1.0)


def test_vocap_known_values():
    # perfect ranking: 2 TPs out of 2 GT
    prec, rec, _ = poseval.compute_rpc(np.array([0.9, 0.8]), np.array([1, 1]), 2)
    assert poseval.vocap(rec, prec) == pytest.approx(1.0)
    # one FP ranked first
    prec, rec, _ = poseval.compute_rpc(np.array([0.9, 0.8]), np.array([0, 1]), 1)
    assert poseval.vocap(rec, prec) == pytest.approx(0.5)


def test_assignment_perfect_match():
    pts = [{"id": [i], "x": [float(10 + i)], "y": [20.0], "score": [0.9]}
           for i in range(15)]
    gt_pts = [{"id": [i], "x": [float(10 + i)], "y": [20.0]} for i in range(15)]
    gt = [{"annorect": [{"annopoints": [{"point": gt_pts}], "x1": [0], "y1": [0],
                         "x2": [10], "y2": [10], "track_id": [0]}]}]
    pr = [{"annorect": [{"annopoints": [{"point": pts}], "track_id": [0],
                         "score": [0.9]}]}]
    ap, pre, rec = poseval.evaluate_ap(gt, pr)
    assert ap[15, 0] == pytest.approx(100.0)


def test_dataset_evaluate_perfect_predictions(synth, tmp_path):
    """GT joints fed back as predictions -> AP == 100 everywhere
    (SURVEY.md §4 integration test)."""
    json_dir, img_dir, annot_dir = synth
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    ds = PoseTrackDataset(cfg, "validate")

    n = len(ds)
    preds = np.zeros((n, 17, 3))
    boxes = np.zeros((n, 6))
    filenames_map = {}
    for i, rec in enumerate(ds.data):
        preds[i, :, :2] = rec["joints_3d"][:, :2]
        preds[i, :, 2] = 0.95
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(rec["scale"] * 200)
        boxes[i, 5] = 0.99
        filenames_map.setdefault(rec["image"], []).append(i)

    name_value, mean_ap = ds.evaluate(cfg, preds, str(tmp_path), boxes,
                                      filenames_map)
    assert mean_ap == pytest.approx(100.0)
    for k, v in name_value.items():
        assert v == pytest.approx(100.0), k

    # corrupted predictions drop AP
    bad = preds.copy()
    bad[:, :, 0] += 200.0
    _, mean_bad = ds.evaluate(cfg, bad, str(tmp_path / "bad"), boxes,
                              filenames_map)
    assert mean_bad < 20.0


def test_convert_videos_round_trip(synth):
    json_dir, img_dir, annot_dir = synth
    files = sorted(osp.join(annot_dir, f) for f in
                   __import__("os").listdir(annot_dir))
    with open(files[0]) as f:
        old = json.load(f)
    new = convert_videos(old)[0]
    assert "images" in new and "annotations" in new
    back = convert_videos(new)[0]
    assert len(back["annolist"]) == len(old["annolist"])
    r_old = old["annolist"][0]["annorect"][0]
    r_back = back["annolist"][0]["annorect"][0]
    p_old = {p["id"][0]: (p["x"][0], p["y"][0])
             for p in r_old["annopoints"][0]["point"]}
    p_back = {p["id"][0]: (p["x"][0], p["y"][0])
              for p in r_back["annopoints"][0]["point"]}
    for k in p_old:
        assert p_back[k] == pytest.approx(p_old[k])


def test_video2filenames(synth):
    json_dir, img_dir, annot_dir = synth
    out, lengths = video2filenames(annot_dir)
    assert len(out) == 2
    for k, v in lengths.items():
        assert k.startswith("images/")
        assert v == 5


def test_pt15_mapping_is_permutation():
    assert sorted(set(PT15_FROM_COCO17)) == sorted(PT15_FROM_COCO17)
    assert len(PT15_FROM_COCO17) == 15


def test_joint_name_tables_consistent():
    """The 15-joint orderings live in three modules, each citing its own
    reference source (setup.py converters, keypoints mapping, poseval's
    evaluate.py which alone says 'neck' for head_bottom).  Index-based
    conversion tables are built from them, so any drift silently scrambles
    joints — pin the correspondence."""
    from otpose_tpu.evaluate.converters import PT18_LM_NAMES
    from otpose_tpu.evaluate.keypoints import (POSETRACK_COCO_17,
                                               POSETRACK_OFFICIAL_15)
    from otpose_tpu.evaluate.poseval import JOINT_NAMES, N_JOINTS
    from otpose_tpu.evaluate.tracking import N_JOINTS as N_JOINTS_TRACKING

    assert PT18_LM_NAMES == POSETRACK_OFFICIAL_15
    alias = ["neck" if n == "head_bottom" else n for n in POSETRACK_OFFICIAL_15]
    assert JOINT_NAMES == alias
    assert N_JOINTS == N_JOINTS_TRACKING == len(JOINT_NAMES) == 15
    assert len(POSETRACK_COCO_17) == 17
    assert set(POSETRACK_OFFICIAL_15) <= set(POSETRACK_COCO_17) | {"head_bottom"}
