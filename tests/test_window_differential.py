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
paths (ref :429-432), and the existence fallback that only covers prev/next
(ref :306-312).
"""

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


@pytest.mark.parametrize("is_2018", [False, True], ids=["pt17", "pt18"])
def test_window_selection_matches_reference(tmp_path, is_2018):
    json_dir, img_dir, _ = make_synthetic_posetrack(
        str(tmp_path), num_videos=2, frames_per_video=5, people_per_frame=1,
        img_w=64, img_h=64, is_2018=is_2018)
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir  # the val/test phase reads this root
    cfg.DATASET.COLOR_RGB = True
    cfg.DATASET.INPUT_TYPE = "spatiotemporal_window"  # ref getitem dispatch
    cfg.VAL.USE_GT_BBOX = True
    cfg.WORKERS = 0

    ref_ds = _build_ref_dataset(cfg)

    from otpose_tpu.data.posetrack import PoseTrackDataset

    ours = PoseTrackDataset(cfg, "validate")
    assert len(ref_ds) == len(ours) > 0

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
    # every frame of every video was compared, including both video edges
    assert checked == 2 * 5
