"""Visualization / debug-artifact parity (VERDICT r1 task 10).

Covers save_fusion_images, image2video <-> video2images, and the
DEBUG.VIS_* runner branches (ref: utils/evaluate.py:244-338,
utils/images.py:136-174, script/Common.py:455-602).
"""

import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_save_fusion_images(tmp_path):
    from otpose_tpu.utils.images import save_fusion_images

    rng = np.random.RandomState(0)
    img = rng.rand(64, 48, 3).astype(np.float32)
    heatmaps = rng.rand(17, 24, 18).astype(np.float32)
    paths = save_fusion_images(str(tmp_path), img, name="s0_",
                               heatmaps=heatmaps)
    assert len(paths) == 17
    assert all(osp.isfile(p) for p in paths)
    names = {osp.basename(p) for p in paths}
    assert "s0_nose_img_heatmap.png" in names
    assert "s0_right_ankle_img_heatmap.png" in names
    out = cv2.imread(paths[0])
    assert out.shape == (64, 48, 3)


def test_image2video_round_trip(tmp_path):
    from otpose_tpu.utils.images import image2video, video2images

    frames_dir = tmp_path / "frames"
    os.makedirs(frames_dir)
    rng = np.random.RandomState(1)
    for i in range(6):
        cv2.imwrite(str(frames_dir / f"{i:08d}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8))
    out = image2video(str(frames_dir), "clip", fps=5,
                      out_dir=str(tmp_path / "out"))
    if not osp.isfile(out) or os.path.getsize(out) == 0:
        pytest.skip("no mp4 encoder in this OpenCV build")
    back_dir = tmp_path / "back"
    n = video2images(out, str(back_dir))
    assert n == 6
    assert len(os.listdir(back_dir)) == 6


def test_runner_debug_vis_branches(tmp_path):
    """_dump_vis and _tb_image_grids run end-to-end on a synthetic batch."""
    from otpose_tpu.config import get_cfg
    from otpose_tpu.engine.runner import _dump_vis, _tb_image_grids

    rng = np.random.RandomState(2)
    b, hh, ww, j = 2, 32, 32, 17
    batch = {
        "inputs": rng.randn(b, hh, ww, 15).astype(np.float32),
        "target": rng.rand(b, 8, 8, j).astype(np.float32),
    }
    metas = [{"center": np.array([16.0, 16.0]), "scale": np.array([0.2, 0.2]),
              "image": "v/x/00000001.jpg", "score": 1.0} for _ in range(b)]
    preds = rng.rand(b, 8, 8, j).astype(np.float32)

    cfg = get_cfg()
    cfg.DEBUG.VIS_SKELETON = True
    cfg.DEBUG.VIS_BBOX = True
    _dump_vis(cfg, str(tmp_path), "validate", 0, batch, metas, preds)
    vis_dir = tmp_path / "validate_vis"
    assert vis_dir.is_dir() and len(os.listdir(vis_dir)) >= 1

    class FakeTB:
        def __init__(self):
            self.calls = []

        def add_images(self, tag, imgs, step, dataformats=None):
            self.calls.append((tag, np.asarray(imgs).shape))

    tb = FakeTB()
    _tb_image_grids(tb, batch, global_steps=0)
    tags = [t for t, _ in tb.calls]
    assert "train/input_images" in tags and "train/gt_heatmaps" in tags


def test_draw_bbox_and_origin_image_accumulation(tmp_path):
    """draw_skeleton_in_origin_image overlays accumulate across calls on the
    SAME original frame (ref: utils/images.py:40-88 re-reads the written
    file), and the subdir mirrors the reference naming."""
    from otpose_tpu.utils.images import draw_bbox, draw_skeleton_in_origin_image

    img_root = tmp_path / "data" / "images" / "val" / "v001"
    os.makedirs(img_root)
    frame = str(img_root / "00000001.jpg")
    cv2.imwrite(frame, np.full((64, 64, 3), 255, np.uint8))

    out = draw_bbox(np.zeros((32, 32, 3), np.uint8), (4, 4, 20, 20),
                    label="p0")
    assert out.sum() > 0

    save_dir = str(tmp_path / "vis")
    coords = np.zeros((1, 17, 3))
    coords[0, :, 0] = np.linspace(8, 56, 17)   # x
    coords[0, :, 1] = np.linspace(8, 56, 17)   # y
    coords[0, :, 2] = 1.0                      # confident
    # person 1
    w1 = draw_skeleton_in_origin_image([frame], coords,
                                       [(4, 4, 30, 30)], save_dir)
    assert len(w1) == 1
    assert osp.join("SkeletonAndBbox", "val", "v001") in w1[0]
    after_one = cv2.imread(w1[0]).astype(np.int64)
    # person 2 accumulates on the same output frame
    coords2 = coords.copy()
    coords2[0, :, 0] = 60 - coords[0, :, 0]
    w2 = draw_skeleton_in_origin_image([frame], coords2,
                                       [(30, 30, 60, 60)], save_dir)
    assert w2 == w1
    after_two = cv2.imread(w2[0]).astype(np.int64)
    assert np.abs(after_two - after_one).sum() > 0  # second overlay landed

    # skeleton-only / bbox-only select the reference's subdir names
    w3 = draw_skeleton_in_origin_image([frame], coords, [(0, 0, 1, 1)],
                                       save_dir, vis_bbox=False)
    assert osp.sep + "skeleton" + osp.sep in w3[0]
    w4 = draw_skeleton_in_origin_image([frame], coords, [(0, 0, 1, 1)],
                                       save_dir, vis_skeleton=False)
    assert osp.sep + "bbox" + osp.sep in w4[0]


def test_vis_origin_images_runner_hook(tmp_path):
    """_vis_origin_images back-projects through cs2box and writes overlays
    for every sample in the batch (ref: script/Common.py:591-602)."""
    from otpose_tpu.config import get_cfg
    from otpose_tpu.engine.runner import _vis_origin_images

    img_root = tmp_path / "images" / "val" / "v002"
    os.makedirs(img_root)
    frames = []
    for i in range(2):
        f = str(img_root / f"0000000{i}.jpg")
        cv2.imwrite(f, np.full((48, 48, 3), 200, np.uint8))
        frames.append(f)

    rng = np.random.RandomState(3)
    metas = [{"center": np.array([24.0, 24.0]), "scale": np.array([0.2, 0.2]),
              "image": frames[i]} for i in range(2)]
    preds = rng.rand(2, 17, 3) * 40
    maxvals = np.ones((2, 17, 1))

    cfg = get_cfg()
    cfg.DEBUG.VIS_SKELETON = True
    cfg.DEBUG.VIS_BBOX = True
    _vis_origin_images(cfg, str(tmp_path / "out"), "validate", metas,
                       preds, maxvals)
    written_root = tmp_path / "out" / "validate_vis" / "SkeletonAndBbox"
    found = [osp.join(r, f) for r, _, fs in os.walk(written_root) for f in fs]
    assert len(found) == 2
