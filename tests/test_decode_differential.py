"""Differential decode oracle: otpose_tpu/ops/heatmap.py vs the reference's
utils/heatmap.py, head-to-head on ADVERSARIAL random fixtures.

Same rationale as tests/test_poseval_differential.py: the decode path
(argmax + tie-breaks + quarter-pixel shift + affine back-projection) and the
gaussian target generator (truncation rounding, 3-sigma window clipping,
out-of-bounds zeroing) carry the mAP numbers, and hand-built unit fixtures
cannot see tie-breaking or boundary bugs.  Fixtures include exact argmax
ties, peaks on every border ring, all-negative maps (the maxval>0 pred
mask), zero-gradient plateaus (sign(0) in the quarter shift), and joints
far outside the image (ref: utils/heatmap.py:48-171).
"""

import sys
import types

import numpy as np
import pytest

from otpose_tpu.ops import heatmap as ours

from tests.helpers.reference import import_reference_module, _stub_module


@pytest.fixture(scope="module")
def ref_hm():
    # utils/heatmap.py pulls in utils/transform.py, whose import block needs
    # torchvision; the decode path never calls into it
    if "torchvision" not in sys.modules:
        class _Noop:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tvt = _stub_module("torchvision.transforms",
                           Compose=lambda fns: (lambda x: x),
                           ToTensor=_Noop, Normalize=_Noop, GaussianBlur=_Noop)
        tv = _stub_module("torchvision")
        tv.transforms = tvt
    return import_reference_module("utils.heatmap")


def _adversarial_heatmaps(rng: np.random.RandomState, b=4, j=17, h=24, w=18):
    """Random maps seeded with every decode edge case."""
    hm = rng.randn(b, j, h, w).astype(np.float32)
    # exact argmax ties: two cells share the global max
    m = hm[0, 0].max() + 1.0
    hm[0, 0, 3, 4] = m
    hm[0, 0, 10, 11] = m
    # peaks on the border rings (px/py in {0, 1, size-2, size-1}: the
    # quarter shift applies only strictly inside)
    big = np.abs(hm).max() + 2.0
    for k, (py, px) in enumerate([(0, 5), (1, 5), (h - 1, 5), (h - 2, 5),
                                  (5, 0), (5, 1), (5, w - 1), (5, w - 2)]):
        hm[1, k, py, px] = big
    # all-negative map: maxval <= 0 zeroes the prediction coords
    hm[2, 0] = -np.abs(hm[2, 0]) - 0.5
    # zero-gradient plateau around the peak: sign(0) path in the shift
    hm[2, 1, :, :] = 0.25
    hm[2, 1, 7, 7] = 1.0
    hm[2, 1, 7, 8] = hm[2, 1, 7, 6] = 0.25  # dx == 0 exactly
    # duplicate max value within one row (argmax flat-index tie-break)
    hm[3, 0, 5, 2] = hm[3, 0, 5, 9] = np.abs(hm[3, 0]).max() + 1.0
    return hm


@pytest.mark.parametrize("seed", range(5))
def test_get_max_preds_matches_reference(ref_hm, seed):
    rng = np.random.RandomState(seed)
    hm = _adversarial_heatmaps(rng)
    got_p, got_v = ours.get_max_preds(hm)
    want_p, want_v = ref_hm.get_max_preds(hm.copy())
    np.testing.assert_array_equal(got_p, want_p)
    np.testing.assert_array_equal(got_v, want_v)


@pytest.mark.parametrize("seed", range(5))
def test_get_final_preds_matches_reference(ref_hm, seed):
    rng = np.random.RandomState(100 + seed)
    hm = _adversarial_heatmaps(rng)
    b = hm.shape[0]
    center = rng.uniform(50, 900, size=(b, 2)).astype(np.float64)
    scale = rng.uniform(0.5, 3.0, size=(b, 2)).astype(np.float64)
    got_p, got_v = ours.get_final_preds(hm, center, scale)
    want_p, want_v = ref_hm.get_final_preds(hm.copy(), center.copy(),
                                            scale.copy())
    np.testing.assert_array_equal(got_v, want_v)
    # the back-projection affines are algebraically identical but expressed
    # differently, so the float64 matrix (and the final f32 store) can land
    # 1 ULP apart — ~6e-5 px at 1000-px coords.  Real decode bugs are at the
    # 0.25-heatmap-px scale (≈ 2.5 image px after the ~10x affine), so 1e-2
    # separates noise from defect by three orders of magnitude.
    np.testing.assert_allclose(got_p, want_p, rtol=0, atol=1e-2)


@pytest.mark.parametrize("sigma", [1, 2, 3])
@pytest.mark.parametrize("seed", range(3))
def test_generate_heatmaps_matches_reference(ref_hm, sigma, seed):
    rng = np.random.RandomState(200 + seed)
    j = 17
    # int arrays, matching the reference's real call site
    # (dataset/Base.py:18 np.array(cfg.MODEL.HEATMAP_SIZE)); float sizes
    # crash its np.zeros shape
    image_size = np.array([288, 384])
    heatmap_size = np.array([72, 96])
    # joints scattered from far outside (negative, truncation-vs-floor
    # rounding) to far past the border (oob weight zeroing)
    joints = np.zeros((j, 3))
    joints[:, 0] = rng.uniform(-60, image_size[0] + 60, size=j)
    joints[:, 1] = rng.uniform(-60, image_size[1] + 60, size=j)
    joints_vis = np.zeros((j, 3))
    joints_vis[:, 0] = rng.randint(0, 2, size=j).astype(np.float64)
    jw = rng.uniform(0.5, 1.5, size=(j, 1)).astype(np.float32)

    for kwargs in ({}, {"use_different_joints_weight": True,
                        "joints_weight": jw}):
        got_t, got_w = ours.generate_heatmaps(
            joints, joints_vis, sigma, image_size, heatmap_size, j, **kwargs)
        want_t, want_w = ref_hm.generate_heatmaps(
            joints.copy(), joints_vis.copy(), sigma, image_size.copy(),
            heatmap_size.copy(), j, **kwargs)
        np.testing.assert_array_equal(got_w, want_w)
        np.testing.assert_allclose(got_t, want_t, rtol=0, atol=1e-7)


def test_normalize_and_sigma_schedule_match_reference(ref_hm):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    hm = rng.rand(2, 3, 8, 6).astype(np.float32) + 0.1
    got = np.asarray(ours.normalize_0_to_1(jnp.asarray(hm)))
    want = ref_hm.normalize_0_to_1(torch.from_numpy(hm)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    schedule = [10, 20, 30]
    for epoch in range(40):
        assert ours.adjust_sigma(epoch, 3, schedule) == \
            ref_hm.adjust_sigma(epoch, 3, schedule)
