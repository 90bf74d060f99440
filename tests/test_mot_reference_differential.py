"""Head-to-head MOT tracking differential against the reference's OWN code.

py-motmetrics is not installable in this environment (zero egress), so the
reference's tracking scorer cannot run stock.  This test runs the
reference's ENTIRE tracking path anyway — ``utils/evaluate.py:232-241
evaluate_tracking`` -> ``assignGTmulti :467-682`` -> ``computeMetrics
:923-1119`` — with ``motmetrics`` replaced by a minimal shim whose
accumulator is the INDEPENDENT brute-force oracle from
``tests/test_pt18_and_tracking.py`` (exhaustive assignment search,
re-derived from the motmetrics contract; shares no code with
``otpose_tpu/evaluate/tracking.py``) and whose metrics host reads the
oracle's event counters.  The shim's ``events['D']`` keeps the
pre-RAW-events motmetrics semantics (matched distances only) that the
vendored poseval was written against.

Both sides load the SAME corrupted prediction files from disk, so the
distance/assignment construction, sequence loop, last-frame drop, per-joint
accumulation, and MOTA/MOTP/precision/recall finalization are all compared
ours-vs-reference end-to-end on imperfect streams with misses, false
positives, duplicate track ids, and forced ID switches (VERDICT r4 task 3).
"""

import copy
import json
import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

from otpose_tpu.evaluate import poseval
from otpose_tpu.evaluate.tracking import evaluate_tracking

from tests.helpers.reference import import_reference_evaluate
from tests.helpers.synthetic_data import make_synthetic_posetrack
from tests.test_data_eval import _cfg_for
from tests.test_pt18_and_tracking import _oracle_update

cv2 = pytest.importorskip("cv2")


class _ShimAccumulator:
    """motmetrics.MOTAccumulator stand-in backed by the brute-force oracle."""

    def __init__(self, auto_id=False, **_kw):
        self.st = {"last": {}, "num_misses": 0, "num_switches": 0,
                   "num_false_positives": 0, "num_objects": 0,
                   "num_detections": 0, "sum_d": 0.0}

    def update(self, oids, hids, dists):
        _oracle_update(self.st, list(oids), list(hids),
                       np.asarray(dists, np.float64))

    @property
    def events(self):
        # pre-1.1 motmetrics events table: distances exist only for matched
        # (MATCH/SWITCH) rows, so events['D'].sum() is the matched-distance
        # total (MISS/FP rows are NaN and pandas sum skips them)
        return {"D": np.asarray([self.st["sum_d"]], np.float64)}


class _ShimMetricsHost:
    """mm.metrics.create() stand-in: compute() reads the oracle counters."""

    def compute(self, acc, metrics=(), return_dataframe=False, name=None):
        return {m: acc.st[m] for m in metrics}


def _install_motmetrics_shim():
    mod = sys.modules.get("motmetrics")
    if mod is None:
        mod = types.ModuleType("motmetrics")
        sys.modules["motmetrics"] = mod
    mod.MOTAccumulator = _ShimAccumulator
    mod.metrics = types.SimpleNamespace(create=_ShimMetricsHost)
    return mod


def _corrupt_predictions(pred_dir: str, seed: int = 11) -> None:
    """Deterministically damage the written prediction jsons in place:
    coordinate jitter (some joints pushed far -> per-joint misses + FPs),
    rotated track ids on odd frames (-> ID switches), a dropped person on
    every third frame (-> misses), and a duplicated person on every fourth
    frame (-> FPs AND a duplicate hypothesis id, the motmetrics hid-masking
    case)."""
    rng = np.random.RandomState(seed)
    for fname in sorted(os.listdir(pred_dir)):
        path = osp.join(pred_dir, fname)
        with open(path) as f:
            blob = json.load(f)
        for fi, frame in enumerate(blob["annolist"]):
            rects = frame.get("annorect") or []
            if fi % 2 == 1 and len(rects) > 1:
                ids = [r["track_id"][0] for r in rects]
                for r, nid in zip(rects, ids[1:] + ids[:1]):
                    r["track_id"] = [nid]
            for r in rects:
                for p in (r.get("annopoints") or [{}])[0].get("point", []):
                    if rng.rand() < 0.15:
                        p["x"] = [float(p["x"][0]) + 400.0]
                        p["y"] = [float(p["y"][0]) + 400.0]
                    else:
                        p["x"] = [float(p["x"][0]) + float(rng.randn())]
                        p["y"] = [float(p["y"][0]) + float(rng.randn())]
            if len(rects) > 1 and fi % 3 == 2:
                rects.pop(int(rng.randint(len(rects))))
            if rects and fi % 4 == 1:
                rects.append(copy.deepcopy(rects[0]))
            frame["annorect"] = rects
        with open(path, "w") as f:
            json.dump(blob, f)


@pytest.fixture(scope="module")
def corrupted_tracking_dirs(tmp_path_factory):
    """(annot_dir, pred_dir) with GT-perfect predictions corrupted on disk."""
    root = tmp_path_factory.mktemp("mot_ref_diff")
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(root), is_2018=True, num_videos=3, frames_per_video=6,
        people_per_frame=3)
    from otpose_tpu.data.posetrack import PoseTrackDataset

    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    cfg.DATASET.IS_2018 = True
    ds = PoseTrackDataset(cfg, "validate")
    n = len(ds)
    preds = np.zeros((n, 17, 3))
    boxes = np.zeros((n, 6))
    fmap = {}
    for i, rec in enumerate(ds.data):
        preds[i, :, :2] = rec["joints_3d"][:, :2]
        preds[i, :, 2] = 0.9
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 5] = 0.9
        fmap.setdefault(rec["image"], []).append(i)
    out_dir = str(root / "out")
    ds.evaluate(cfg, preds, out_dir, boxes, fmap)
    pred_dir = osp.join(out_dir, "val_set_json_results")
    _corrupt_predictions(pred_dir)
    return annot_dir, pred_dir


def test_tracking_tables_match_reference_pipeline(corrupted_tracking_dirs,
                                                 tmp_path):
    annot_dir, pred_dir = corrupted_tracking_dirs
    ref_eval = import_reference_evaluate()
    _install_motmetrics_shim()

    with np.errstate(divide="ignore", invalid="ignore"):
        gt_ref, pr_ref = ref_eval.load_data_dir(["", annot_dir, pred_dir])
        fin_ref = ref_eval.evaluate_tracking(gt_ref, pr_ref, str(tmp_path))

    gt_ours, pr_ours = poseval.load_data_dir(annot_dir, pred_dir)
    fin_ours = evaluate_tracking(gt_ours, pr_ours)

    for name in ("mota", "motp", "pre", "rec"):
        np.testing.assert_allclose(
            np.asarray(fin_ours[name], np.float64),
            np.asarray(fin_ref[name], np.float64),
            rtol=0, atol=1e-9, equal_nan=True,
            err_msg=f"{name} table diverges from the reference pipeline")


def test_corrupted_stream_is_genuinely_imperfect(corrupted_tracking_dirs):
    """Guard that the differential is not trivially passing on perfect
    tracking: the corruption must actually produce misses/FPs/switches."""
    annot_dir, pred_dir = corrupted_tracking_dirs
    gt, pr = poseval.load_data_dir(annot_dir, pred_dir)
    fin = evaluate_tracking(gt, pr)
    assert fin["mota"][0, -1] < 99.0, fin["mota"]
    assert fin["pre"][0, -1] < 99.9, fin["pre"]
    assert fin["rec"][0, -1] < 99.9, fin["rec"]
    assert fin["motp"][0, -1] < 100.0 - 1e-6, fin["motp"]
