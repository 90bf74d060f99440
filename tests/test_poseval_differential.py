"""Differential AP oracle: otpose_tpu/evaluate/poseval.py vs the reference's
vendored poseval, head-to-head on IMPERFECT random fixtures (VERDICT r2
task 3).

The reference's exact scoring algorithm (utils/evaluate.py:467-682
assignGTmulti, :686-751 compute_rpc/compute_metrics/vocap) runs on CPU once
its unused hard imports (motmetrics, shapely, yacs) are stubbed — none are
touched on the no-ignore-region AP path.  Equality on random fixtures with
missing joints, duplicate predictions, score ties, unmatched poses, empty
frames, and zero-GT joints is where greedy-assignment tie-breaking bugs
hide; perfect-prediction tests cannot see them.
"""

import copy

import numpy as np
import pytest

from otpose_tpu.evaluate import poseval

from tests.helpers.reference import import_reference_evaluate


@pytest.fixture(scope="module")
def ref_eval():
    return import_reference_evaluate()


# ---------------------------------------------------------------------------
# random imperfect fixtures
# ---------------------------------------------------------------------------

def _points(rng, xy, joint_ids, scores=None, dup_prob=0.0):
    pts = []
    for i in joint_ids:
        p = {"id": [int(i)], "x": [float(xy[i, 0])], "y": [float(xy[i, 1])]}
        if scores is not None and not np.isnan(scores[i]):
            p["score"] = [float(scores[i])]
        pts.append(p)
        if rng.random() < dup_prob:
            # duplicate joint id inside one rect: reference keeps the FIRST
            q = dict(p, x=[float(xy[i, 0] + rng.uniform(-40, 40))])
            pts.append(q)
    return pts


def _make_case(seed: int):
    """One random (gt_frames, pr_frames) annolist pair with adversarial
    structure.  Joint 0 is globally withheld from GT in odd seeds so some
    joints have predictions but zero GT (the nan-AP branch)."""
    rng = np.random.default_rng(seed)
    nJ = 15
    n_frames = int(rng.integers(2, 6))
    ban_joint = 0 if seed % 2 else -1
    gt_frames, pr_frames = [], []
    track = 0
    for f in range(n_frames):
        n_gt = int(rng.integers(0, 4))
        gt_rects, pr_rects = [], []
        for g in range(n_gt):
            cx, cy = rng.uniform(100, 800), rng.uniform(100, 600)
            head = rng.uniform(25, 70)
            xy = np.stack([cx + rng.uniform(-60, 60, nJ),
                           cy + rng.uniform(-90, 90, nJ)], axis=1)
            vis = rng.random(nJ) < 0.8
            if ban_joint >= 0:
                vis[ban_joint] = False
            joint_ids = np.flatnonzero(vis)
            rect = {"x1": [float(cx - head)], "y1": [float(cy - 1.4 * head)],
                    "x2": [float(cx + 0.4 * head)], "y2": [float(cy - 0.2 * head)],
                    "track_id": [track], "score": [1.0],
                    "annopoints": [{"point": _points(rng, xy, joint_ids)}]}
            if rng.random() < 0.08:
                rect["annopoints"] = []  # GT pose without points
            gt_rects.append(rect)
            track += 1

            # predicted pose(s) for this GT: jittered joints, some inside and
            # some outside the PCKh 0.5*headsize threshold, coarse-quantized
            # scores to force ties, occasional missing score key
            for _ in range(1 + (rng.random() < 0.3)):  # 30% duplicate pose
                if rng.random() < 0.12:
                    continue  # missed detection
                keep = rng.random(nJ) < 0.85
                noise_scale = np.where(rng.random(nJ) < 0.6, 0.2, 2.0)
                pxy = xy + rng.normal(0, 1, (nJ, 2)) * (noise_scale * head)[:, None]
                scores = np.round(rng.random(nJ), 1)
                scores[rng.random(nJ) < 0.1] = np.nan  # missing score key
                pr_rects.append({
                    "track_id": [track + 1000],
                    "annopoints": [{"point": _points(
                        rng, pxy, np.flatnonzero(keep), scores, dup_prob=0.05)}],
                })
        # false positives far from everything
        for _ in range(int(rng.integers(0, 3))):
            fxy = np.stack([rng.uniform(1000, 2000, nJ),
                            rng.uniform(1000, 2000, nJ)], axis=1)
            scores = np.round(rng.random(nJ), 1)
            pr_rects.append({
                "track_id": [track + 2000],
                "annopoints": [{"point": _points(
                    rng, fxy, np.flatnonzero(rng.random(nJ) < 0.7), scores)}],
            })
        # degenerate prediction the reference filters out (evaluate.py:510-514).
        # NOTE "annopoints": [] is NOT generated: the reference indexes
        # annopoints[0] unguarded and crashes on it, so an empty list is
        # outside the accepted input domain (its own writer never emits one).
        if rng.random() < 0.3:
            pr_rects.append({"track_id": [9998], "annopoints": [{}]})
        gt_frames.append({"annorect": gt_rects})
        pr_frames.append({"annorect": pr_rects})
    return gt_frames, pr_frames


@pytest.mark.parametrize("seed", range(20))
def test_ap_matches_reference_on_imperfect_fixtures(ref_eval, seed):
    gt, pr = _make_case(seed)
    # both implementations mutate pr_frames (annorect filtering): deep-copy
    with np.errstate(divide="ignore", invalid="ignore"):
        ap_ref, pre_ref, rec_ref = ref_eval.evaluate_ap(
            copy.deepcopy(gt), copy.deepcopy(pr))
    ap_ours, pre_ours, rec_ours = poseval.evaluate_ap(
        copy.deepcopy(gt), copy.deepcopy(pr))
    for ours, ref, what in ((ap_ours, ap_ref, "AP"), (pre_ours, pre_ref, "prec"),
                            (rec_ours, rec_ref, "recall")):
        np.testing.assert_allclose(
            np.asarray(ours, dtype=np.float64), np.asarray(ref, np.float64),
            rtol=0, atol=1e-9, equal_nan=True,
            err_msg=f"{what} mismatch on seed {seed}")


def test_assignment_scores_labels_match_reference(ref_eval):
    """The raw per-joint score/label streams (the assignment itself) must
    match element-for-element, not just the final AP."""
    gt, pr = _make_case(101)
    s_ref, l_ref, n_ref, _ = ref_eval.assignGTmulti(
        copy.deepcopy(gt), copy.deepcopy(pr), 0.5)
    s_ours, l_ours, n_ours, _ = poseval.assign_gt_multi(
        copy.deepcopy(gt), copy.deepcopy(pr), 0.5)
    np.testing.assert_array_equal(n_ours, n_ref)
    for j in range(15):
        for img in range(n_ref.shape[1]):
            np.testing.assert_allclose(
                np.asarray(s_ours[j][img], np.float64).ravel(),
                np.asarray(s_ref[j][img], np.float64).ravel(),
                err_msg=f"scores joint {j} img {img}")
            np.testing.assert_array_equal(
                np.asarray(l_ours[j][img], np.int8).ravel(),
                np.asarray(l_ref[j][img], np.int8).ravel(),
                err_msg=f"labels joint {j} img {img}")
