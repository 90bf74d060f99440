import numpy as np
import pytest

from otpose_tpu.ops.affine import (apply_affine_to_points, exec_affine_transform,
                                   get_affine_transform, invert_affine, warp_affine)
from otpose_tpu.ops.bbox import box2cs, cs2box
from otpose_tpu.ops.heatmap import (generate_heatmaps, generate_heatmaps_device,
                                    get_final_preds, get_max_preds, get_max_preds_device,
                                    refine_coords_device)

cv2 = pytest.importorskip("cv2")


def _ref_affine(center, scale, rot, output_size, inv=0):
    """cv2-based oracle for the 3-point affine solve (formula from
    reference utils/transform.py:76-105)."""
    scale_tmp = np.asarray(scale) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_point = [0, src_w * -0.5]
    src_dir = np.array([src_point[0] * cs - src_point[1] * sn,
                        src_point[0] * sn + src_point[1] * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center
    src[1, :] = center + src_dir
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    src[2, :] = third(src[0], src[1])
    dst[2, :] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0, 17.5, -45])
@pytest.mark.parametrize("inv", [0, 1])
def test_affine_matrix_matches_cv2(rot, inv):
    center = np.array([120.0, 210.0], np.float32)
    scale = np.array([1.3, 1.73], np.float32)
    ours = get_affine_transform(center, scale, rot, (288, 384), inv=inv)
    ref = _ref_affine(center, scale, rot, (288, 384), inv=inv)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_affine_round_trip():
    center = np.array([100.0, 150.0])
    scale = np.array([1.1, 1.4])
    fwd = get_affine_transform(center, scale, 30, (288, 384))
    inv = get_affine_transform(center, scale, 30, (288, 384), inv=1)
    pts = np.array([[10.0, 20.0], [200.0, 330.0], [50.0, 90.0]])
    back = apply_affine_to_points(apply_affine_to_points(pts, fwd), inv)
    np.testing.assert_allclose(back, pts, atol=1e-3)
    # invert_affine agrees with the inv=1 construction
    np.testing.assert_allclose(invert_affine(fwd), inv, atol=1e-3)


def test_exec_affine_transform():
    t = np.array([[1.0, 0.0, 5.0], [0.0, 2.0, -3.0]])
    out = exec_affine_transform([2.0, 4.0], t)
    np.testing.assert_allclose(out, [7.0, 5.0])


def test_warp_affine_matches_cv2(rng):
    img = rng.rand(240, 320, 3).astype(np.float32) * 255
    center = np.array([160.0, 120.0], np.float32)
    scale = np.array([0.9, 1.2], np.float32)
    for rot in [0.0, 25.0]:
        trans = get_affine_transform(center, scale, rot, (72, 96))
        ref = cv2.warpAffine(img, np.float64(trans), (72, 96), flags=cv2.INTER_LINEAR)
        inv = invert_affine(trans)
        ours = np.asarray(warp_affine(img[None], inv[None], 96, 72))[0]
        # cv2 uses 5-bit fixed-point interpolation weights -> small quantization
        assert np.abs(ours - ref).max() < 2.5


def test_warp_affine_separable_matches_cv2_and_gather(rng):
    """The separable (matmul) warp must equal cv2 and the gather warp for
    axis-aligned maps, including border blending (BORDER_CONSTANT 0)."""
    from otpose_tpu.ops.affine import warp_affine_separable

    img = rng.rand(240, 320, 3).astype(np.float32) * 255
    center = np.array([30.0, 110.0], np.float32)  # near the border on purpose
    scale = np.array([0.9, 1.2], np.float32)
    trans = get_affine_transform(center, scale, 0.0, (72, 96))
    inv = invert_affine(trans)
    assert abs(inv[0, 1]) < 1e-5 and abs(inv[1, 0]) < 1e-5  # axis-aligned
    ref = cv2.warpAffine(img, np.float64(trans), (72, 96), flags=cv2.INTER_LINEAR)
    gather = np.asarray(warp_affine(img[None], inv[None], 96, 72))[0]
    ours = np.asarray(warp_affine_separable(img[None], inv[None], 96, 72))[0]
    assert np.abs(ours - ref).max() < 2.5      # cv2 5-bit fixed point
    np.testing.assert_allclose(ours, gather, atol=1e-2)

    # per-sample batched matrices
    imgs = rng.rand(3, 64, 80, 3).astype(np.float32)
    invs = np.stack([
        np.array([[0.5, 0, 4.0], [0, 0.7, 2.0]], np.float32),
        np.array([[1.5, 0, -3.0], [0, 1.1, 1.0]], np.float32),
        np.array([[2.0, 0, 40.0], [0, 2.0, 30.0]], np.float32),  # off-edge
    ])
    g = np.asarray(warp_affine(imgs, invs, 32, 24))
    s = np.asarray(warp_affine_separable(imgs, invs, 32, 24))
    np.testing.assert_allclose(s, g, atol=1e-4)


def test_box2cs_cs2box():
    c, s = box2cs([10, 20, 50, 100], aspect_ratio=0.75, enlarge_factor=1.0)
    np.testing.assert_allclose(c, [35.0, 70.0])
    # width fitted up to aspect 0.75*100 = 75
    np.testing.assert_allclose(s, [75 / 200, 100 / 200])
    box = cs2box(c, s)
    np.testing.assert_allclose(box, [35 - 37.5, 70 - 50, 75, 100])


def _oracle_heatmaps(joints, joints_vis, sigma, image_size, heatmap_size, num_joints):
    """Direct loop transcription of the reference formula (utils/heatmap.py:48-105)."""
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]
    target = np.zeros((num_joints, heatmap_size[1], heatmap_size[0]), dtype=np.float32)
    tmp_size = sigma * 3
    for joint_id in range(num_joints):
        feat_stride = np.asarray(image_size) / np.asarray(heatmap_size)
        mu_x = int(joints[joint_id][0] / feat_stride[0] + 0.5)
        mu_y = int(joints[joint_id][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= heatmap_size[0] or ul[1] >= heatmap_size[1] or br[0] < 0 or br[1] < 0:
            target_weight[joint_id] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], heatmap_size[0]) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], heatmap_size[1]) - ul[1]
        img_x = max(0, ul[0]), min(br[0], heatmap_size[0])
        img_y = max(0, ul[1]), min(br[1], heatmap_size[1])
        if target_weight[joint_id] > 0.5:
            target[joint_id][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


def test_generate_heatmaps_matches_oracle(rng):
    image_size = np.array([288, 384])
    heatmap_size = np.array([72, 96])
    joints = np.zeros((17, 3))
    joints[:, 0] = rng.uniform(-30, 320, 17)
    joints[:, 1] = rng.uniform(-30, 420, 17)
    joints_vis = np.zeros((17, 3))
    joints_vis[:, 0] = (rng.rand(17) > 0.3).astype(np.float64)
    t_ours, w_ours = generate_heatmaps(joints, joints_vis, 3, image_size, heatmap_size, 17)
    t_ref, w_ref = _oracle_heatmaps(joints, joints_vis, 3, image_size, heatmap_size, 17)
    np.testing.assert_allclose(w_ours, w_ref)
    np.testing.assert_allclose(t_ours, t_ref, atol=1e-6)


def test_generate_heatmaps_device_matches_host(rng):
    image_size = np.array([288, 384])
    heatmap_size = np.array([72, 96])
    feat_stride = (image_size / heatmap_size).astype(np.float32)
    B = 3
    joints = rng.uniform(-20, 400, (B, 17, 2)).astype(np.float32)
    vis = (rng.rand(B, 17) > 0.3).astype(np.float32)
    t_dev, w_dev = generate_heatmaps_device(joints, vis, np.float32(3.0), feat_stride,
                                            72, 96, 17)
    for b in range(B):
        j3 = np.concatenate([joints[b], np.zeros((17, 1))], axis=1)
        v3 = np.stack([vis[b]] * 3, axis=1)
        t_ref, w_ref = generate_heatmaps(j3, v3, 3, image_size, heatmap_size, 17)
        np.testing.assert_allclose(np.asarray(t_dev)[b], t_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_dev)[b], w_ref, atol=1e-6)


def test_get_max_preds(rng):
    hm = rng.rand(2, 17, 96, 72).astype(np.float32)
    preds, maxvals = get_max_preds(hm)
    preds_d, maxvals_d = get_max_preds_device(hm)
    np.testing.assert_allclose(preds, np.asarray(preds_d))
    np.testing.assert_allclose(maxvals, np.asarray(maxvals_d), rtol=1e-6)
    b, j = 1, 5
    flat_idx = hm[b, j].argmax()
    assert preds[b, j, 0] == flat_idx % 72
    assert preds[b, j, 1] == flat_idx // 72


def test_quarter_pixel_shift():
    hm = np.zeros((1, 1, 96, 72), dtype=np.float32)
    hm[0, 0, 50, 30] = 1.0
    hm[0, 0, 50, 31] = 0.5  # gradient to the right
    hm[0, 0, 49, 30] = 0.3  # gradient upward
    coords, _ = refine_coords_device(hm)
    np.testing.assert_allclose(np.asarray(coords)[0, 0], [30.25, 49.75])


def test_get_final_preds_back_projection():
    hm = np.zeros((1, 1, 96, 72), dtype=np.float32)
    hm[0, 0, 48, 36] = 1.0
    center = np.array([[100.0, 100.0]])
    scale = np.array([[0.72, 0.96]])  # crop covers 144x192 px
    preds, maxvals = get_final_preds(hm, center, scale)
    # center of heatmap -> center of box (modulo the half-pixel grid offset)
    assert abs(preds[0, 0, 0] - 100.0) < 2.0
    assert abs(preds[0, 0, 1] - 100.0) < 2.0
    assert maxvals[0, 0, 0] == 1.0
