"""File-level pipeline composite: score the REAL eval pipeline's written
prediction jsons with the reference's vendored poseval, head-to-head with
ours.

The fixture-level differential (tests/test_poseval_differential.py) proves
the scoring algorithm; this closes the remaining glue gap: the annolist
jsons our ``dataset.evaluate`` writer emits (data/posetrack.py:387-477,
ref: datasets/PoseTrackDataset.py:453-608) — produced by an *untrained*
model, so predictions are genuinely imperfect — must parse and score
identically under the official scorer a reference user would run
(ref: utils/evaluate.py:820-881 load_data_dir, :754-763 evaluate_ap).
Together with the flagship forward-parity and decode differentials, this
pins every stage of the eval path to the reference implementation.
"""

import os.path as osp

import numpy as np
import pytest

from otpose_tpu.evaluate import poseval
from otpose_tpu.utils.testing import tiny_otpose_cfg

from tests.helpers.reference import import_reference_evaluate
from tests.helpers.synthetic_data import make_synthetic_posetrack

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pipeline_output(tmp_path_factory):
    """Run the real eval pipeline (untrained tiny model, synthetic PoseTrack)
    and return (annot_dir, pred_dir, name_values, mean_ap)."""
    import jax

    from otpose_tpu.data.loader import Loader
    from otpose_tpu.data.posetrack import PoseTrackDataset
    from otpose_tpu.engine.runner import evaluate_epoch
    from otpose_tpu.engine.trainer import make_eval_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose

    root = tmp_path_factory.mktemp("pipe_vs_ref")
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(root), num_videos=2, frames_per_video=4, people_per_frame=2,
        img_w=96, img_h=96)
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.OUTPUT_DIR = str(root / "output")
    cfg.DATASET.NAME = "PoseTrack"
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir
    cfg.DATASET.COLOR_RGB = True
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True

    ds = PoseTrackDataset(cfg, "validate")
    loader = Loader(ds, 4, shuffle=False, num_workers=2)
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(7), spec)
    out_dir = str(root / "eval_out")
    name_values, mean_ap = evaluate_epoch(make_eval_step(spec), params, state,
                                          loader, ds, cfg, out_dir)
    pred_dir = osp.join(out_dir, "val_set_json_results")
    return annot_dir, pred_dir, name_values, mean_ap


def test_written_jsons_score_identically_under_reference_scorer(pipeline_output):
    annot_dir, pred_dir, name_values, mean_ap = pipeline_output
    ref_eval = import_reference_evaluate()

    with np.errstate(divide="ignore", invalid="ignore"):
        gt_ref, pr_ref = ref_eval.load_data_dir(["", annot_dir, pred_dir])
        ap_ref, pre_ref, rec_ref = ref_eval.evaluate_ap(gt_ref, pr_ref)

    gt_ours, pr_ours = poseval.load_data_dir(annot_dir, pred_dir)
    ap_ours, pre_ours, rec_ours = poseval.evaluate_ap(gt_ours, pr_ours)

    for ours, ref, what in ((ap_ours, ap_ref, "AP"),
                            (pre_ours, pre_ref, "precision"),
                            (rec_ours, rec_ref, "recall")):
        np.testing.assert_allclose(
            np.asarray(ours, np.float64), np.asarray(ref, np.float64),
            rtol=0, atol=1e-9, equal_nan=True,
            err_msg=f"{what} mismatch on real pipeline output")

    # the pipeline's returned table must BE the reference scorer's numbers
    cum_ref = poseval.get_cum(np.asarray(ap_ref, np.float64))
    table = [name_values[k] for k in ("Head", "Shoulder", "Elbow", "Wrist",
                                      "Hip", "Knee", "Ankle", "Mean")]
    np.testing.assert_allclose(np.asarray(table, np.float64),
                               np.asarray(cum_ref, np.float64),
                               rtol=0, atol=1e-9)
    assert mean_ap == pytest.approx(cum_ref[-1], abs=1e-9)


def test_untrained_predictions_are_imperfect(pipeline_output):
    """Guard that the composite is not trivially passing on perfect preds
    (an untrained model must not score 100 AP everywhere)."""
    _, _, name_values, _ = pipeline_output
    vals = np.asarray([name_values[k] for k in name_values], np.float64)
    assert np.nanmin(vals) < 99.0, vals
