#!/usr/bin/env python
"""Offline person-box generation for PoseTrack detection-mode evaluation.

Produces a boxes json consumed by PoseTrackDataset._load_detection_results
(ref: PoseTrackDataset.py:176-226; entries {image_name, bbox, score,
category_id, nframes, frame_id}).  Reference counterpart: the standalone
object_detector/YOLOv3 module run over val frames.

Usage:
  python tools/generate_boxes.py --json_dir <dir> --img_dir <dir> \
      --weights yolov3.weights --out val_boxes.json
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json_dir", required=True,
                    help="dir with posetrack_val.json (for the frame list)")
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--weights", default="", help="darknet yolov3.weights")
    ap.add_argument("--out", required=True)
    ap.add_argument("--conf_thres", type=float, default=0.4)  # reference default (detector_yolov3.py:21)
    ap.add_argument("--nms_thres", type=float, default=0.4)
    ap.add_argument("--split", default="posetrack_val.json")
    ap.add_argument("--variant", default="yolov3",
                    choices=["yolov3", "yolov3-tiny"])
    args = ap.parse_args()

    import cv2

    from otpose_tpu.data.coco_json import CocoIndex
    from otpose_tpu.detector.yolov3 import YoloV3Detector

    det = YoloV3Detector(args.weights or None, conf_thres=args.conf_thres,
                        nms_thres=args.nms_thres, variant=args.variant)
    coco = CocoIndex(osp.join(args.json_dir, args.split))
    out = []
    for i, img_id in enumerate(coco.get_img_ids()):
        im = coco.load_img(img_id)
        path = osp.join(args.img_dir, im["file_name"])
        frame = cv2.imread(path)
        if frame is None:
            print(f"skip unreadable {path}")
            continue
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        for x, y, w, h, score in det.detect_persons(rgb):
            out.append({
                "image_name": im["file_name"],
                "bbox": [x, y, w, h],
                "score": score,
                "category_id": 1,
                # hard-index: a json without these fields would write a
                # boxes file whose nframes=0 silently degenerates every
                # temporal window downstream (the GT loader KeyErrors on
                # the same condition)
                "nframes": im["nframes"],
                "frame_id": im["frame_id"],
            })
        if i % 100 == 0:
            print(f"{i}/{len(coco.imgs)} images, {len(out)} boxes")
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} boxes to {args.out}")


if __name__ == "__main__":
    main()
