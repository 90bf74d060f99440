"""Synthetic PoseTrack-format dataset generator for integration tests.

Creates a tiny directory tree with jpg frames and a COCO-style json matching
the layout the reference consumes (ref: PoseTrackDataset.py:67,101-174), plus
a matching poseval annotation dir for end-to-end evaluation tests.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np


# distinct BGR color per joint for ``joint_markers`` fixtures (17 entries)
_JOINT_COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (128, 0, 0), (0, 128, 0), (0, 0, 128), (128, 128, 0),
    (128, 0, 128), (0, 128, 128), (255, 128, 0), (128, 255, 0),
    (0, 128, 255), (255, 0, 128), (64, 192, 255),
]


def make_synthetic_posetrack(root: str, *, num_videos: int = 2,
                             frames_per_video: int = 5, people_per_frame: int = 2,
                             img_w: int = 128, img_h: int = 96,
                             is_2018: bool = False, seed: int = 0,
                             labeled_every: int = 1,
                             joint_markers: bool = False):
    """Returns (json_dir, img_dir, annot_dir). Frames are numbered like
    PT17 (8-digit, 1-based) or PT18 (6-digit, 0-based).

    ``joint_markers=True`` draws a distinct-color dot AT each GT joint so
    joints are visually localizable — without it the GT joints are random
    offsets around a plain circle and ~38 AP is the task's oracle ceiling
    (no model can sharpen its heatmaps on such data; round-5 bf16-parity
    work).  Default False keeps the historical fixture byte-identical."""
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = osp.join(root, "images")
    json_dir = osp.join(root, "json")
    annot_dir = osp.join(root, "annot")
    os.makedirs(json_dir, exist_ok=True)
    os.makedirs(annot_dir, exist_ok=True)

    zero_fill = 6 if is_2018 else 8
    start = 0 if is_2018 else 1

    images, annotations = [], []
    ann_id = 1
    img_id = 1000
    per_video_gt = {}

    for v in range(num_videos):
        vname = f"{v:05d}_bonn" if not is_2018 else f"{v:06d}_bonn_train"
        vdir = osp.join(img_dir, "train", vname)
        os.makedirs(vdir, exist_ok=True)
        gt_frames = []
        for f in range(frames_per_video):
            frame_num = start + f
            fname = osp.join(vdir, str(frame_num).zfill(zero_fill) + ".jpg")
            if joint_markers:
                # uniform background: the dtype-parity test needs a model
                # that learns razor-sharp peaks in ~100 steps, and noise
                # backgrounds keep localization soft for far longer
                img = np.full((img_h, img_w, 3), 120, dtype=np.uint8)
            else:
                img = rng.randint(0, 255, (img_h, img_w, 3), dtype=np.uint8)
            people = []
            for p in range(people_per_frame):
                cx = rng.randint(25, img_w - 25)
                cy = rng.randint(20, img_h - 20)
                cv2.circle(img, (cx, cy), 8, (255, 255, 255), -1)
                people.append((cx, cy))
            # joint_markers: draw the joints BEFORE writing the image so the
            # pixels carry them; positions are reused verbatim below so the
            # GT annotations match the drawn dots exactly
            pre_joints = None
            if joint_markers and (f % labeled_every) == 0:
                pre_joints = []
                for (cx, cy) in people:
                    jxy = [(float(np.clip(cx + rng.randn() * 4, 0, img_w - 1)),
                            float(np.clip(cy + rng.randn() * 4, 0, img_h - 1)))
                           for _j in range(17)]
                    pre_joints.append(jxy)
                    for j, (jx, jy) in enumerate(jxy):
                        cv2.circle(img, (int(round(jx)), int(round(jy))), 2,
                                   _JOINT_COLORS[j], -1)
            cv2.imwrite(fname, img)

            rel = osp.relpath(fname, img_dir)
            labeled = (f % labeled_every) == 0
            images.append({
                "id": img_id, "file_name": rel,
                "width": img_w, "height": img_h,
                "nframes": frames_per_video, "frame_id": frame_num,
                "is_labeled": labeled,
            })
            frame_people = []
            if labeled:
                for pi, (cx, cy) in enumerate(people):
                    kpts = []
                    jxy = []
                    for j in range(17):
                        if pre_joints is not None:
                            jx, jy = pre_joints[pi][j]
                        else:
                            jx = float(np.clip(cx + rng.randn() * 4, 0, img_w - 1))
                            jy = float(np.clip(cy + rng.randn() * 4, 0, img_h - 1))
                        kpts += [jx, jy, 1]
                        jxy.append((jx, jy))
                    x0 = max(0.0, cx - 20)
                    y0 = max(0.0, cy - 16)
                    bw = min(img_w - 1 - x0, 40.0)
                    bh = min(img_h - 1 - y0, 32.0)
                    annotations.append({
                        "id": ann_id, "image_id": img_id, "category_id": 1,
                        "bbox": [x0, y0, bw, bh], "area": bw * bh,
                        "iscrowd": 0, "keypoints": kpts, "num_keypoints": 17,
                        "track_id": len(frame_people),
                    })
                    frame_people.append(jxy)
                    ann_id += 1
            gt_frames.append({"frame_num": frame_num, "file": rel,
                              "people": frame_people})
            img_id += 1
        per_video_gt[vname] = gt_frames

    blob = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }
    for name in ("posetrack_train.json", "posetrack_val.json"):
        with open(osp.join(json_dir, name), "w") as fjson:
            json.dump(blob, fjson)

    _write_poseval_annotations(annot_dir, per_video_gt, zero_fill)
    return json_dir, img_dir, annot_dir


def _write_poseval_annotations(annot_dir: str, per_video_gt: dict, zero_fill: int):
    """Per-video GT jsons in the poseval annolist format the evaluator reads
    (ref: utils/evaluate.py:820-880, utils/setup.py:274-783)."""
    for vname, frames in per_video_gt.items():
        annolist = []
        for fr in frames:
            annorects = []
            for track_id, joints in enumerate(fr["people"]):
                points = []
                for j, (jx, jy) in enumerate(_coco17_to_pt15(joints)):
                    points.append({"id": [j], "x": [jx], "y": [jy],
                                   "score": [1.0], "is_visible": [1]})
                xs = [p["x"][0] for p in points]
                ys = [p["y"][0] for p in points]
                head_x0, head_y0 = joints[1][0], joints[1][1]
                head_x1, head_y1 = joints[2][0], joints[2][1]
                annorects.append({
                    "track_id": [track_id],
                    "annopoints": [{"point": points}],
                    "x1": [head_x0 - 6], "y1": [head_y0 - 6],
                    "x2": [head_x1 + 6], "y2": [head_y1 + 6],
                    "score": [1.0],
                })
            annolist.append({
                "image": [{"name": "images/" + fr["file"].replace(os.sep, "/")}],
                "annorect": annorects,
                "imgnum": [fr["frame_num"]],
                "is_labeled": [1 if fr["people"] else 0],
            })
        with open(osp.join(annot_dir, vname + ".json"), "w") as f:
            json.dump({"annolist": annolist}, f)


def _coco17_to_pt15(joints):
    """PoseTrack-COCO-17 joint list -> PoseTrack-official-15 ordering (pure
    reorder; head_bottom/head_top exist in both orderings —
    ref: configs/constants.py:2-56, utils/keypoints.py:7-66)."""
    joints = np.asarray(joints, dtype=np.float64)
    mapping = [16, 14, 12, 11, 13, 15, 10, 8, 6, 5, 7, 9, 1, 0, 2]
    return joints[mapping]
