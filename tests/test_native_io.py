import numpy as np
import pytest

from otpose_tpu.data import native
from otpose_tpu.ops.affine import get_affine_transform, invert_affine
from otpose_tpu.ops.heatmap import generate_heatmaps

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native lib not built (make -C native)")


def test_decode_jpeg_batch(tmp_path, rng):
    paths = []
    originals = []
    for i in range(4):
        img = rng.randint(0, 255, (40 + i, 60, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
        originals.append(img)
    out, hs, ws, fails = native.decode_jpeg_batch(paths, 64, 64)
    assert fails == 0
    for i in range(4):
        assert (hs[i], ws[i]) == originals[i].shape[:2]
        # must match cv2's decode of the same file exactly
        ref = cv2.cvtColor(cv2.imread(paths[i]), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(out[i, :hs[i], :ws[i]], ref)


def test_decode_missing_file(tmp_path):
    out, hs, ws, fails = native.decode_jpeg_batch([str(tmp_path / "nope.jpg")], 32, 32)
    assert fails == 1
    assert hs[0] == 0


def test_warp_normalize_matches_cv2(rng):
    img = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    center = np.array([32.0, 24.0])
    scale = np.array([0.3, 0.22])
    trans = get_affine_transform(center, scale, 15.0, (32, 24))
    ref = cv2.warpAffine(img, np.float64(trans), (32, 24), flags=cv2.INTER_LINEAR)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref_norm = (ref.astype(np.float32) / 255.0 - mean) / std

    imgs = img[None]
    inv = invert_affine(trans)[None]
    out = native.warp_normalize_batch(imgs, np.array([48]), np.array([64]),
                                      inv, 24, 32)
    # cv2 uses fixed-point interpolation; tolerance accounts for that
    assert np.abs(out[0] - ref_norm).max() < 0.05


def test_generate_targets_matches_python(rng):
    n, j = 3, 17
    joints = rng.uniform(-10, 300, (n, j, 2))
    vis = (rng.rand(n, j) > 0.3).astype(np.float32)
    target, weight = native.generate_targets_batch(joints, vis, 3.0, 4.0, 4.0,
                                                   72, 96)
    for i in range(n):
        j3 = np.concatenate([joints[i], np.zeros((j, 1))], axis=1)
        v3 = np.stack([vis[i]] * 3, axis=1)
        t_ref, w_ref = generate_heatmaps(j3, v3, 3, np.array([288, 384]),
                                         np.array([72, 96]), j)
        np.testing.assert_allclose(target[i], t_ref, atol=1e-5)
        np.testing.assert_allclose(weight[i], w_ref[:, 0], atol=1e-6)


def test_host_loader_native_path_matches_cv2(tmp_path, rng):
    """The production Loader routes warp/target-gen through the native batch
    kernels (native_host=True, the default).  Pixels must match the cv2 path
    within bilinear fixed-point tolerance and targets exactly."""
    from otpose_tpu.data.loader import Loader
    from otpose_tpu.data.posetrack import PoseTrackDataset
    from tests.helpers.synthetic_data import make_synthetic_posetrack
    from tests.test_data_eval import _cfg_for

    json_dir, img_dir, annot_dir = make_synthetic_posetrack(str(tmp_path))
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    ds = PoseTrackDataset(cfg, "validate")
    (nb, _) = next(iter(Loader(ds, 4, shuffle=False, num_workers=2)))
    (cb, _) = next(iter(Loader(ds, 4, shuffle=False, num_workers=2,
                               native_host=False)))
    assert np.abs(nb["inputs"] - cb["inputs"]).max() < 0.05
    np.testing.assert_allclose(nb["target"], cb["target"], atol=1e-5)
    np.testing.assert_allclose(nb["target_weight"], cb["target_weight"],
                               atol=1e-6)
