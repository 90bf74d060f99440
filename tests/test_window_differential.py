"""Temporal-window differential vs the reference's own dataset.

The e2e pipeline differential pins PT17 window selection implicitly (any
window drift breaks the 1e-9 AP equality); this test pins it DIRECTLY and
extends to PT18 numbering: for every sample of a synthetic val set, the
reference's ``_get_spatio_temporal_window``
(ref: dataset/PoseTrackDataset.py:228-318) and our
``PoseTrackDataset.select_window`` must choose the same 5 frame files and
the same 4 margins — including the reference quirks our loader deliberately
preserves: nnext == next (ref :290-293), the meta dict's duplicate
``prev_sup_image``/``next_sup_image`` keys ending up as the pprev/nnext
paths (ref :429-432).  The existence fallback (ref :306-312, prev/next
only) never fires on contiguous frames; ``test_window_existence_fallback``
below fires it for real on a gapped video.
"""

import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not available")

from otpose_tpu.utils.testing import tiny_otpose_cfg

from tests.helpers.reference import (import_reference_evaluate,
                                     import_reference_module)
from tests.helpers.synthetic_data import make_synthetic_posetrack


def _build_ref_dataset(cfg):
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001 — the reference uses the removed alias
    import_reference_evaluate()  # stubs torchvision/motmetrics/shapely/yacs
    from tests.helpers.coco_stub import install as install_coco_stub

    install_coco_stub()
    mod = import_reference_module("dataset.PoseTrackDataset")
    ds = mod.PoseTrackDataset(cfg, "validate")
    from tests.test_e2e_pipeline_differential import _eval_transform

    ds.transform = _eval_transform()
    return ds


def _window_cfg(json_dir, img_dir):
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir  # the val/test phase reads this root
    cfg.DATASET.COLOR_RGB = True
    cfg.DATASET.INPUT_TYPE = "spatiotemporal_window"  # ref getitem dispatch
    cfg.VAL.USE_GT_BBOX = True
    cfg.WORKERS = 0
    return cfg


def _compare_every_sample(ref_ds, ours) -> int:
    """Window files + margins of OUR loader vs every reference val sample;
    returns the number of samples compared."""
    checked = 0
    for i in range(len(ref_ds)):
        rec = ref_ds.data[i]
        *_, meta = ref_ds[i]
        win = ours.select_window(rec["image"], rec["nframes"])

        m_ref = [meta["margin_left"], meta["margin_right"],
                 meta["margin_lleft"], meta["margin_rright"]]
        assert [int(m) for m in win["margins"]] == [int(m) for m in m_ref], \
            (i, rec["image"])
        # duplicate-key quirk: meta's prev/next_sup_image hold pprev/nnext
        assert win["files"][3] == meta["prev_sup_image"], (i, rec["image"])
        assert win["files"][4] == meta["next_sup_image"], (i, rec["image"])
        # prev/next reconstructed from margins (the existence fallback zeroes
        # the margin whenever it substitutes the current frame)
        base = osp.basename(rec["image"]).replace(".jpg", "")
        cur = int(base)
        d = osp.dirname(rec["image"])
        prev = osp.join(d, str(cur - int(meta["margin_left"])).zfill(len(base))
                        + ".jpg")
        nxt = osp.join(d, str(cur + int(meta["margin_right"])).zfill(len(base))
                       + ".jpg")
        assert win["files"][1] == prev, (i, rec["image"])
        assert win["files"][2] == nxt, (i, rec["image"])
        assert win["files"][0] == rec["image"] == meta["image"]
        checked += 1
    return checked


@pytest.mark.parametrize("is_2018", [False, True], ids=["pt17", "pt18"])
def test_window_selection_matches_reference(tmp_path, is_2018):
    json_dir, img_dir, _ = make_synthetic_posetrack(
        str(tmp_path), num_videos=2, frames_per_video=5, people_per_frame=1,
        img_w=64, img_h=64, is_2018=is_2018)
    cfg = _window_cfg(json_dir, img_dir)

    ref_ds = _build_ref_dataset(cfg)

    from otpose_tpu.data.posetrack import PoseTrackDataset

    ours = PoseTrackDataset(cfg, "validate")
    assert len(ref_ds) == len(ours) > 0

    # every frame of every video was compared, including both video edges
    assert _compare_every_sample(ref_ds, ours) == 2 * 5


@pytest.mark.parametrize("is_2018", [False, True], ids=["pt17", "pt18"])
def test_window_existence_fallback_matches_reference(tmp_path, is_2018):
    """Fire the prev/next existence fallback (ref :306-312) for real: delete
    one frame's jpg mid-video, so the last frames' computed prev path is
    missing and both sides must substitute the current frame and zero
    margin_left.  Frames whose next/nnext would land on the gap are stripped
    from the json first — the reference's fallback only covers prev/next, so
    a missing nnext is an unconditional crash (``cv2.cvtColor(None)``,
    ref :330-336) on BOTH the reference and (as a documented ValueError) our
    loader; the differential can only cover the surviving samples."""
    json_dir, img_dir, _ = make_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=5, people_per_frame=1,
        img_w=64, img_h=64, is_2018=is_2018)
    start = 0 if is_2018 else 1
    gap = start + 3
    zero_fill = 6 if is_2018 else 8

    # delete the gap frame's image from disk
    vdirs = [d for d in
             (osp.join(img_dir, "train", v)
              for v in os.listdir(osp.join(img_dir, "train")))]
    assert len(vdirs) == 1
    gap_file = osp.join(vdirs[0], str(gap).zfill(zero_fill) + ".jpg")
    os.remove(gap_file)

    # strip annotations of the gap frame and of the frame whose next/nnext
    # is the gap (gap-1) so neither side is asked to read the missing file
    # as next/nnext (crash on both sides, see docstring)
    val_json = osp.join(json_dir, "posetrack_val.json")
    blob = json.load(open(val_json))
    dead_ids = {im["id"] for im in blob["images"]
                if im["frame_id"] in (gap - 1, gap)}
    blob["annotations"] = [a for a in blob["annotations"]
                           if a["image_id"] not in dead_ids]
    json.dump(blob, open(val_json, "w"))

    cfg = _window_cfg(json_dir, img_dir)
    ref_ds = _build_ref_dataset(cfg)

    from otpose_tpu.data.posetrack import PoseTrackDataset

    ours = PoseTrackDataset(cfg, "validate")
    assert len(ref_ds) == len(ours) == 3  # start, start+1, start+4

    assert _compare_every_sample(ref_ds, ours) == 3

    # and the fallback genuinely fired on the last frame: prev (= gap) is
    # missing, so prev collapses to the current frame with margin_left = 0
    # while pprev still reaches 2 frames back to an existing file
    last = osp.join(vdirs[0], str(start + 4).zfill(zero_fill) + ".jpg")
    win = ours.select_window(last, 5)
    assert win["files"][1] == last and int(win["margins"][0]) == 0
    assert win["files"][3] == osp.join(
        vdirs[0], str(start + 2).zfill(zero_fill) + ".jpg")
    assert int(win["margins"][2]) == 2
