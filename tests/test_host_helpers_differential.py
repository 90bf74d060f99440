"""Differential tests for the host-side numeric helpers, head-to-head
against the reference implementations on random inputs.

Covers the remaining helpers that previously had only formula/cv2 oracles:
PCK accuracy (ref: utils/evaluate.py:352-415), keypoint format conversion
(ref: utils/keypoints.py:7-66), affine transform construction/application +
flip + half-body (ref: utils/transform.py:20-127), and the PT17<->PT18
video converters (ref: utils/setup.py:767-790).  Same rationale as the
poseval/decode differentials: these carry the mAP numbers, and hand-built
fixtures cannot see branch/tie-breaking divergences.
"""

import copy
import json
import os.path as osp

import numpy as np
import pytest

from tests.helpers.reference import import_reference_evaluate, import_reference_module

from otpose_tpu.evaluate import keypoints as our_kps
from otpose_tpu.evaluate import pck as our_pck
from otpose_tpu.ops import affine as our_affine
from otpose_tpu.ops import bbox as our_bbox


# ---------------------------------------------------------------------------
# PCK accuracy
# ---------------------------------------------------------------------------

def _adversarial_pck_maps(rng, b=6, j=17, h=24, w=18):
    """Heatmap pairs exercising the -1 invisible branch (GT peak at x<=1 or
    y<=1), argmax ties, and all-negative maps."""
    out = rng.standard_normal((b, j, h, w)).astype(np.float32)
    tgt = rng.standard_normal((b, j, h, w)).astype(np.float32)
    tgt[0, 0] = 0.0                     # flat: argmax ties at (0, 0) -> invisible
    tgt[1, 1] = -np.abs(tgt[1, 1])      # all-negative target
    tgt[2, 2, :, :2] = 10.0             # GT peak pinned at x<=1 -> invisible
    tgt[3, 3, :2, :] = 10.0             # GT peak pinned at y<=1 -> visible (x>1 possible)
    out[4, 4] = out[4, 4].max()         # prediction plateau (tie-break)
    return out, tgt


@pytest.mark.parametrize("seed", range(5))
def test_pck_accuracy_matches_reference(seed):
    ref_eval = import_reference_evaluate()
    rng = np.random.default_rng(seed)
    out, tgt = _adversarial_pck_maps(rng)
    acc_r, avg_r, cnt_r, pred_r = ref_eval.accuracy(out.copy(), tgt.copy())
    acc_o, avg_o, cnt_o, pred_o = our_pck.accuracy(out, tgt)
    np.testing.assert_allclose(acc_o, acc_r, rtol=0, atol=1e-12)
    assert avg_o == pytest.approx(avg_r, abs=1e-12)
    assert cnt_o == cnt_r
    np.testing.assert_array_equal(pred_o, pred_r)


def test_pck_all_invisible_matches_reference():
    ref_eval = import_reference_evaluate()
    out = np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32)
    tgt = np.zeros((2, 3, 8, 8), np.float32)  # every GT decodes to (0,0)
    acc_r, avg_r, cnt_r, _ = ref_eval.accuracy(out.copy(), tgt.copy())
    acc_o, avg_o, cnt_o, _ = our_pck.accuracy(out, tgt)
    np.testing.assert_allclose(acc_o, acc_r, rtol=0, atol=0)
    assert (avg_o, cnt_o) == (avg_r, cnt_r)


# ---------------------------------------------------------------------------
# keypoint conversion (writer path)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,global_score", [(0, 1.0), (1, 0.37), (2, -0.5),
                                               (3, 0.0)])
def test_coco2posetrack_ord_matches_reference(seed, global_score):
    ref_kps = import_reference_module("utils.keypoints")
    rng = np.random.RandomState(seed)
    preds = rng.randn(4, 17) * 50  # x; y; score; score — incl. negative scores
    got = our_kps.coco2posetrack_ord(preds, global_score=global_score)
    want = ref_kps.coco2posetrack_ord(preds, global_score=global_score)
    assert len(got) == len(want) == 15
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert g["x"][0] == pytest.approx(w["x"][0], abs=1e-12)
        assert g["y"][0] == pytest.approx(w["y"][0], abs=1e-12)
        assert g["score"][0] == pytest.approx(w["score"][0], abs=1e-12)


def test_convert_data_to_annorect_struct_matches_reference():
    ref_eval = import_reference_evaluate()
    rng = np.random.RandomState(4)
    poses = [rng.randn(4, 17) * 30 for _ in range(3)]
    boxes = [rng.randn(1, 6) for _ in range(3)]
    tracks = [5, 9, 2]
    got = our_kps.convert_data_to_annorect_struct(poses, tracks, boxes)
    want = ref_eval.convert_data_to_annorect_struct(poses, tracks, boxes)
    assert json.loads(json.dumps(got)) == json.loads(json.dumps(want))
    # empty-frame sentinel rect
    got0 = our_kps.convert_data_to_annorect_struct([], [], [])
    want0 = ref_eval.convert_data_to_annorect_struct([], [], [])
    assert json.loads(json.dumps(got0)) == json.loads(json.dumps(want0))


# ---------------------------------------------------------------------------
# affine transforms
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(8))
def test_get_affine_transform_matches_reference(seed):
    ref_tf = import_reference_module("utils.transform")
    rng = np.random.RandomState(seed)
    center = rng.uniform(50, 900, 2).astype(np.float32)
    scale = np.asarray(rng.uniform(0.5, 4.0, 2), np.float32)
    rot = float(rng.uniform(-45, 45)) if seed % 2 else 0.0
    output_size = [288, 384] if seed % 3 else [72, 96]
    shift = (np.zeros(2, np.float32) if seed < 4
             else rng.uniform(-0.1, 0.1, 2).astype(np.float32))
    for inv in (0, 1):
        want = ref_tf.get_affine_transform(center, scale, rot, output_size,
                                           shift=shift, inv=inv)
        got = our_affine.get_affine_transform(center, scale, rot, output_size,
                                              shift=shift, inv=inv)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
        # point application parity on the same matrix
        pt = rng.uniform(0, 500, 2)
        np.testing.assert_allclose(our_affine.exec_affine_transform(pt, want),
                                   ref_tf.exec_affine_transform(pt, want),
                                   rtol=0, atol=1e-9)


def test_fliplr_joints_matches_reference():
    ref_tf = import_reference_module("utils.transform")
    rng = np.random.RandomState(1)
    matched = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
               (15, 16)]
    joints = rng.uniform(0, 287, (17, 3)).astype(np.float32)
    vis = (rng.rand(17, 1) < 0.8).astype(np.float32) * np.ones((17, 3), np.float32)
    j_r, v_r = ref_tf.fliplr_joints(joints.copy(), vis.copy(), 288, matched)
    j_o, v_o = our_affine.fliplr_joints(joints.copy(), vis.copy(), 288, matched)
    np.testing.assert_allclose(j_o, j_r, rtol=0, atol=0)
    np.testing.assert_allclose(v_o, v_r, rtol=0, atol=0)


@pytest.mark.parametrize("seed", range(6))
def test_half_body_matches_reference(seed):
    """Both draw exactly one np.random.randn(); pin the global seed for the
    reference and hand ours an identically-seeded RandomState."""
    ref_tf = import_reference_module("utils.transform")
    rng = np.random.RandomState(seed)
    joints = rng.uniform(0, 500, (17, 3)).astype(np.float32)
    vis = np.zeros((17, 3), np.float32)
    vis[rng.rand(17) < (0.2 + 0.1 * seed), :] = 1.0  # sparse -> None branches
    upper = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    np.random.seed(1000 + seed)
    c_r, s_r = ref_tf.half_body_transform(joints.copy(), vis.copy(), 17,
                                          upper, 288 / 384, 200)
    c_o, s_o = our_bbox.half_body_center_scale(
        joints.copy(), vis.copy(), 17, upper, 288 / 384, pixel_std=200,
        rng=np.random.RandomState(1000 + seed))
    if c_r is None:
        assert c_o is None and s_o is None
    else:
        np.testing.assert_allclose(c_o, c_r, rtol=0, atol=0)
        np.testing.assert_allclose(s_o, s_r, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# PT17 <-> PT18 converters
# ---------------------------------------------------------------------------

def _reference_setup():
    # utils/setup.py imports the full model registry chain; only
    # convert_videos is needed and it touches none of it at call time
    import_reference_evaluate()  # installs the yacs/motmetrics/shapely stubs
    return import_reference_module("utils.setup")


def test_video2filenames_json_matches_reference(tmp_path):
    """>=2 json files: the reference only takes the json path then (its
    single-json case falls through to an empty .mat scan — ours deliberately
    fixes that; see converters.video2filenames)."""
    ref_setup = _reference_setup()
    old = {"annolist": [{"image": [{"name": f"images/val/00001_bonn/{i:08d}.jpg"}],
                         "annorect": []} for i in range(1, 5)]}
    new = {"images": [{"file_name": f"images/val/00002_bonn/{i:06d}.jpg",
                       "nframes": 7} for i in range(3)]}
    json.dump(old, open(osp.join(tmp_path, "00001_bonn.json"), "w"))
    json.dump(new, open(osp.join(tmp_path, "00002_bonn.json"), "w"))
    from otpose_tpu.evaluate.converters import video2filenames

    out_r, len_r = ref_setup.video2filenames(str(tmp_path))
    out_o, len_o = video2filenames(str(tmp_path))
    assert out_o == out_r
    assert len_o == len_r


def test_video2filenames_mat_matches_reference(tmp_path):
    sio = pytest.importorskip("scipy.io")
    ref_setup = _reference_setup()
    for seq, n in (("00003_mpii", 5), ("00004_mpii", 2)):
        frames = [{"image": {"name": f"images/val/{seq}/{i:08d}.jpg"}}
                  for i in range(1, n + 1)]
        sio.savemat(osp.join(tmp_path, seq + ".mat"), {"annolist": frames})
    from otpose_tpu.evaluate.converters import video2filenames

    out_r, len_r = ref_setup.video2filenames(str(tmp_path))
    out_o, len_o = video2filenames(str(tmp_path))
    assert out_o == out_r
    assert len_o == len_r


def test_convert_videos_matches_reference_both_directions(tmp_path):
    from tests.helpers.synthetic_data import make_synthetic_posetrack

    pytest.importorskip("cv2")
    ref_setup = _reference_setup()
    # reference bug: SCORE_WARNING_EMITTED is declared `global` and read
    # before ever being assigned (utils/setup.py:444,498 NameError on any
    # annotation without per-landmark "scores"); pre-seed it so the oracle
    # runs on GT-style inputs
    if not hasattr(ref_setup, "SCORE_WARNING_EMITTED"):
        ref_setup.SCORE_WARNING_EMITTED = True
    json_dir, _img, annot_dir = make_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=3, people_per_frame=2,
        img_w=64, img_h=64, is_2018=True)
    from otpose_tpu.evaluate.converters import convert_videos as ours

    # new (PT18) -> old (annolist).  Real PT18 category entries carry the
    # keypoint names (the synthetic fixture omits them); both converters read
    # the same augmented blob.
    import glob

    new_blob = json.load(open(sorted(glob.glob(osp.join(json_dir, "*.json")))[0]))
    new_blob["categories"][0]["keypoints"] = list(our_kps.POSETRACK_COCO_17)
    got = ours(copy.deepcopy(new_blob))
    want = ref_setup.convert_videos(copy.deepcopy(new_blob))
    assert json.loads(json.dumps(got)) == json.loads(json.dumps(want))

    # old (annolist) -> new (PT18)
    old_blob = json.load(open(sorted(glob.glob(osp.join(annot_dir, "*.json")))[0]))
    got2 = ours(copy.deepcopy(old_blob))
    want2 = ref_setup.convert_videos(copy.deepcopy(old_blob))
    assert json.loads(json.dumps(got2)) == json.loads(json.dumps(want2))
