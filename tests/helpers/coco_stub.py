"""Minimal pycocotools.coco.COCO stand-in for driving the reference dataset.

pycocotools is not installed in this environment; the reference's
PoseTrackDataset only touches six methods of the COCO API
(ref: dataset/PoseTrackDataset.py:67-122) — loadCats/getCatIds/getImgIds/
loadImgs/getAnnIds/loadAnns over a plain COCO-format json.  This implements
exactly that surface from the documented json structure (no pycocotools code
involved).  ``install()`` registers it as ``pycocotools.coco`` only when the
real package is absent.
"""

from __future__ import annotations

import json
import sys
import types
from collections import defaultdict


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset = {}
        self.imgs, self.anns, self.cats = {}, {}, {}
        self.imgToAnns = defaultdict(list)
        if annotation_file is not None:
            with open(annotation_file) as f:
                self.dataset = json.load(f)
            self.createIndex()

    def createIndex(self):
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.imgToAnns[ann["image_id"]].append(ann)
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat

    @staticmethod
    def _as_list(x):
        return x if isinstance(x, (list, tuple)) else [x]

    def getCatIds(self, catNms=(), supNms=(), catIds=()):
        ids = [c["id"] for c in self.dataset.get("categories", [])]
        if catNms:
            ids = [i for i in ids if self.cats[i]["name"] in self._as_list(catNms)]
        if catIds:
            ids = [i for i in ids if i in self._as_list(catIds)]
        return ids

    def getImgIds(self, imgIds=(), catIds=()):
        if not imgIds and not catIds:
            return list(self.imgs.keys())
        ids = set(self._as_list(imgIds)) if imgIds else set(self.imgs)
        if catIds:
            keep = {a["image_id"] for a in self.anns.values()
                    if a["category_id"] in self._as_list(catIds)}
            ids &= keep
        return list(ids)

    def getAnnIds(self, imgIds=(), catIds=(), areaRng=(), iscrowd=None):
        imgIds = self._as_list(imgIds) if imgIds != () else []
        if imgIds:
            anns = [a for i in imgIds for a in self.imgToAnns[i]]
        else:
            anns = list(self.anns.values())
        if catIds != () and catIds:
            anns = [a for a in anns if a["category_id"] in self._as_list(catIds)]
        if iscrowd is not None:
            anns = [a for a in anns if bool(a.get("iscrowd", 0)) == bool(iscrowd)]
        return [a["id"] for a in anns]

    def loadImgs(self, ids):
        return [self.imgs[i] for i in self._as_list(ids)]

    def loadAnns(self, ids):
        return [self.anns[i] for i in self._as_list(ids)]

    def loadCats(self, ids):
        return [self.cats[i] for i in self._as_list(ids)]


def install() -> None:
    """Register the stub as pycocotools.coco if pycocotools is missing."""
    try:
        import pycocotools.coco  # noqa: F401
        return
    except ImportError:
        pass
    pkg = sys.modules.setdefault("pycocotools", types.ModuleType("pycocotools"))
    mod = types.ModuleType("pycocotools.coco")
    mod.COCO = COCO
    pkg.coco = mod
    sys.modules["pycocotools.coco"] = mod
