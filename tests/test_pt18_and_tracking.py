"""PoseTrack18 path (6-digit 0-based frames) + MOT tracking metrics."""

import numpy as np
import pytest

from otpose_tpu.data.posetrack import PoseTrackDataset
from otpose_tpu.evaluate.tracking import MotAccumulator, evaluate_tracking

from tests.helpers.synthetic_data import make_synthetic_posetrack
from tests.test_data_eval import _cfg_for

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def synth18(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth18")
    return make_synthetic_posetrack(str(root), is_2018=True)


def test_pt18_window_selection(synth18):
    json_dir, img_dir, annot_dir = synth18
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    cfg.DATASET.IS_2018 = True
    ds = PoseTrackDataset(cfg, "train")
    # frame 0 (first): no prev
    rec = next(r for r in ds.data if r["frame_id"] == 0)
    win = ds.select_window(rec["image"], rec["nframes"])
    assert win["files"][1] == win["files"][0]
    assert win["margins"][0] == 0
    # middle frame 2 of 0..4
    rec = next(r for r in ds.data if r["frame_id"] == 2)
    win = ds.select_window(rec["image"], rec["nframes"])
    assert win["files"][1].endswith("000001.jpg")
    assert win["files"][3].endswith("000000.jpg")


def test_pt18_evaluate(synth18, tmp_path):
    json_dir, img_dir, annot_dir = synth18
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
    name_value, mean_ap = ds.evaluate(cfg, preds, str(tmp_path), boxes, fmap)
    assert mean_ap == pytest.approx(100.0)


def test_mot_accumulator_semantics():
    acc = MotAccumulator()
    # frame 1: two objects, two hypotheses, perfect match
    acc.update([1, 2], [10, 20], np.array([[0.1, np.nan], [np.nan, 0.1]]))
    assert acc.num_detections == 2 and acc.num_switches == 0
    # frame 2: object 1 switches hypothesis
    acc.update([1, 2], [30, 20], np.array([[0.1, np.nan], [np.nan, 0.1]]))
    assert acc.num_switches == 1
    # frame 3: miss + false positive
    acc.update([1], [20, 40], np.array([[np.nan, np.nan]]))
    assert acc.num_misses == 1
    assert acc.num_false_positives == 2
    assert acc.num_objects == 5


def test_evaluate_tracking_perfect(synth18, tmp_path):
    """Perfect per-frame predictions with consistent track ids -> MOTA 100."""
    json_dir, img_dir, annot_dir = synth18
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    cfg.DATASET.IS_2018 = True
    cfg.EVAL_TRACKING = False
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
    ds.evaluate(cfg, preds, str(tmp_path), boxes, fmap)

    from otpose_tpu.evaluate.poseval import load_data_dir

    gt, pr = load_data_dir(annot_dir,
                           str(tmp_path / "val_set_json_results"))
    fin = evaluate_tracking(gt, pr)
    # note: synthetic preds use per-frame track ids = order within frame,
    # which matches GT track order here -> perfect MOTA
    assert fin["mota"][0, -1] == pytest.approx(100.0, abs=1e-6)
    assert fin["rec"][0, -1] == pytest.approx(100.0, abs=1e-6)

    # corrupt the predicted track ids on alternating frames -> ID switches
    # tank MOTA; the ID-oracle upper bound restores it (VERDICT r1 task 10)
    import copy

    pr_bad = copy.deepcopy(pr)
    for k, frame in enumerate(pr_bad):
        if k % 2 == 0:
            continue
        ids = [r["track_id"][0] for r in frame["annorect"]]
        for r, new_id in zip(frame["annorect"], ids[::-1]):
            r["track_id"] = [new_id]
    fin_bad = evaluate_tracking(copy.deepcopy(gt), copy.deepcopy(pr_bad))
    fin_ub = evaluate_tracking(copy.deepcopy(gt), copy.deepcopy(pr_bad),
                               eval_upper_bound=True)
    assert fin_bad["mota"][0, -1] < 100.0 - 1e-6
    assert fin_ub["mota"][0, -1] == pytest.approx(100.0, abs=1e-6)


def _oracle_update(state, oids, hids, dists):
    """Independent brute-force oracle for one MOTAccumulator.update.

    Re-derived from the py-motmetrics contract the reference consumes
    (ref: utils/evaluate.py:978-1004): (1) persist last frame's
    correspondence when its hypothesis is present, unconsumed, and the
    distance is finite (motmetrics masks each consumed hid, so a hypothesis
    hosts at most one persisted object); (2) match the remaining pairs by
    EXHAUSTIVE search over all finite-distance partial injections —
    maximize match count, tie-break minimum summed distance (what
    Hungarian-with-big-M computes, checked independently here); (3) events:
    SWITCH when a matched object's last hypothesis — across any gap —
    differs, MISS/FP for the unmatched."""
    dists = np.asarray(dists, np.float64).reshape(len(oids), len(hids))
    state["num_objects"] += len(oids)
    matched, used = {}, set()
    for i, o in enumerate(oids):
        h_prev = state["last"].get(o)
        if h_prev is None:
            continue
        js = [j for j, h in enumerate(hids) if h == h_prev and j not in used]
        if js and np.isfinite(dists[i, js[0]]):
            matched[i] = js[0]
            used.add(js[0])
    rem_i = [i for i in range(len(oids)) if i not in matched]
    rem_j = [j for j in range(len(hids)) if j not in used]
    best = {"cnt": -1, "sum": np.inf, "assign": {}}

    def search(k, used_j, cnt, s, assign):
        if k == len(rem_i):
            if cnt > best["cnt"] or (cnt == best["cnt"] and s < best["sum"]):
                best.update(cnt=cnt, sum=s, assign=dict(assign))
            return
        i = rem_i[k]
        search(k + 1, used_j, cnt, s, assign)  # leave i unmatched
        for j in rem_j:
            if j in used_j or not np.isfinite(dists[i, j]):
                continue
            assign[i] = j
            search(k + 1, used_j | {j}, cnt + 1, s + dists[i, j], assign)
            del assign[i]

    search(0, frozenset(), 0, 0.0, {})
    matched.update(best["assign"])
    for i, j in matched.items():
        o, h = oids[i], hids[j]
        if o in state["last"] and state["last"][o] != h:
            state["num_switches"] += 1
        state["num_detections"] += 1
        state["sum_d"] += dists[i, j]
        state["last"][o] = h
    state["num_misses"] += len(oids) - len(matched)
    state["num_false_positives"] += len(hids) - len(matched)


def test_mot_accumulator_vs_bruteforce_oracle():
    """Differential: MotAccumulator vs the independent brute-force oracle on
    randomized imperfect streams — misses, FPs, switches across absence
    gaps, empty frames, all-NaN rows, track-id reuse, and objects whose
    last_match points at the SAME hypothesis (the motmetrics hid-masking
    case).  Continuous random distances make the optimal matching unique
    almost surely, so every counter must agree exactly."""
    rng = np.random.RandomState(7)
    for seq in range(40):
        acc = MotAccumulator()
        st = {"last": {}, "num_misses": 0, "num_switches": 0,
              "num_false_positives": 0, "num_objects": 0,
              "num_detections": 0, "sum_d": 0.0}
        for frame in range(10):
            n_o = int(rng.randint(0, 5))
            n_h = int(rng.randint(0, 5))
            # small id pools force reuse, reappearance-after-gap, and
            # multiple objects sharing a last_match hypothesis
            oids = list(rng.choice(6, size=n_o, replace=False))
            hids = list(rng.choice(6, size=n_h, replace=False))
            dists = rng.rand(n_o, n_h)
            dists[rng.rand(n_o, n_h) < 0.45] = np.nan  # forbidden pairs
            acc.update(list(oids), list(hids), dists.copy())
            _oracle_update(st, list(oids), list(hids), dists.copy())
        for name in ("num_misses", "num_switches", "num_false_positives",
                     "num_objects", "num_detections"):
            assert getattr(acc, name) == st[name], (seq, name)
        assert acc.sum_d == pytest.approx(st["sum_d"], abs=1e-9), seq
