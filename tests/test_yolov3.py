"""YOLOv3 detector + detection-box eval path (VERDICT r1 tasks 5).

Covers: darknet .weights round-trip, head decode on crafted features,
per-class NMS, a full random-weights forward, and the offline
generate_boxes -> _load_detection_boxes -> dataset.evaluate pipeline with
USE_GT_BBOX=False (ref: object_detector/YOLOv3/models.py:286-331,
detector_yolov3.py:58-98, PoseTrackDataset.py:176-226).
"""

import json
import os.path as osp
import sys

import numpy as np
import pytest

from otpose_tpu.detector import yolov3 as Y

from tests.helpers.synthetic_data import make_synthetic_posetrack
from tests.test_data_eval import _cfg_for

cv2 = pytest.importorskip("cv2")


def _write_synthetic_weights(path, seed=0):
    """Build a darknet-layout .weights blob (header + per-conv params in
    file order: bn_bias, bn_scale, bn_mean, bn_var | bias, then OIHW kernel)."""
    rng = np.random.RandomState(seed)
    chunks = [np.asarray([0, 2, 0, 0, 0], np.int32).tobytes()]
    expect = []
    for cin, spec in Y._conv_specs_in_order():
        co, k = spec.out_ch, spec.kernel
        p = {}
        if spec.bn:
            for name in ("bn_bias", "bn_scale", "bn_mean", "bn_var"):
                p[name] = rng.randn(co).astype(np.float32)
                chunks.append(p[name].tobytes())
        else:
            p["bias"] = rng.randn(co).astype(np.float32)
            chunks.append(p["bias"].tobytes())
        w_oihw = rng.randn(co, cin, k, k).astype(np.float32)
        chunks.append(w_oihw.tobytes())
        p["weight_hwio"] = np.transpose(w_oihw, (2, 3, 1, 0))
        expect.append(p)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return expect


def test_darknet_weights_roundtrip(tmp_path):
    path = str(tmp_path / "synthetic.weights")
    expect = _write_synthetic_weights(path)
    loaded = Y.load_darknet_weights(path)
    assert len(loaded) == len(expect) == len(Y._conv_specs_in_order())
    for got, exp in zip(loaded, expect):
        np.testing.assert_array_equal(got["weight"], exp["weight_hwio"])
        for key in ("bn_bias", "bn_scale", "bn_mean", "bn_var", "bias"):
            if key in exp:
                np.testing.assert_array_equal(got[key], exp[key])


def test_darknet_weights_truncated_file_rejected(tmp_path):
    path = str(tmp_path / "synthetic.weights")
    _write_synthetic_weights(path)
    blob = open(path, "rb").read()
    bad = str(tmp_path / "padded.weights")
    open(bad, "wb").write(blob + b"\x00" * 16)  # 4 extra floats
    with pytest.raises(AssertionError, match="weight file mismatch"):
        Y.load_darknet_weights(bad)


def test_decode_head_zero_features():
    """sigmoid(0)=0.5 centers, exp(0)*anchor sizes (ref: models.py:112-235)."""
    import jax.numpy as jnp

    feat = jnp.zeros((1, 2, 2, 255))
    out = np.asarray(Y._decode_head(feat, head_idx=0, img_size=64))
    assert out.shape == (1, 2 * 2 * 3, 85)
    stride = 32
    # first grid cell (0,0), anchors 0..2
    for a, (aw, ah) in enumerate(Y.ANCHORS[0]):
        cx, cy, w, h, obj = out[0, a, :5]
        assert cx == pytest.approx(0.5 * stride)
        assert cy == pytest.approx(0.5 * stride)
        assert w == pytest.approx(aw)
        assert h == pytest.approx(ah)
        assert obj == pytest.approx(0.5)
    # second cell along x: gx=1
    assert out[0, 3, 0] == pytest.approx(1.5 * stride)


def test_nms_crafted():
    """Two heavy-overlap person boxes -> one kept; distinct class kept."""
    def det(cx, cy, w, h, obj, cls_idx, cls_score):
        d = np.zeros(85, np.float32)
        d[:4] = [cx, cy, w, h]
        d[4] = obj
        d[5 + cls_idx] = cls_score
        return d

    dets = np.stack([
        det(100, 100, 40, 40, 0.9, 0, 0.9),   # person, high
        det(102, 101, 40, 40, 0.85, 0, 0.9),  # person, overlaps -> suppressed
        det(200, 200, 30, 30, 0.9, 16, 0.8),  # dog elsewhere -> kept
        det(50, 50, 20, 20, 0.2, 0, 0.9),     # below conf_thres -> dropped
    ])
    kept = Y.non_max_suppression(dets, conf_thres=0.8, nms_thres=0.4)
    assert kept.shape[1] == 7
    classes = sorted(int(c) for c in kept[:, 6])
    assert classes == [0, 16]
    person = kept[kept[:, 6] == 0][0]
    # reference semantics: the suppressed cluster merges into an
    # obj-confidence-weighted box (ref: detector_utils.py:284-287) —
    # x1 = (0.9*80 + 0.85*82) / 1.75
    assert person[0] == pytest.approx((0.9 * 80 + 0.85 * 82) / 1.75)
    assert person[4] == pytest.approx(0.9)  # conf stays the top box's


def test_yolo_forward_shapes_random_weights():
    import jax.numpy as jnp

    weights = Y.init_random_weights(seed=0)
    x = jnp.zeros((1, 64, 64, 3))
    out = np.asarray(Y.yolo_forward(weights, x, img_size=64))
    # heads at strides 32/16/8 on a 64px input: 4+16+64 cells x 3 anchors
    assert out.shape == (1, (4 + 16 + 64) * 3, 85)
    assert np.isfinite(out).all()
    # obj/cls are sigmoided
    assert (out[..., 4] >= 0).all() and (out[..., 4] <= 1).all()


def test_generate_boxes_to_detection_eval_pipeline(tmp_path, monkeypatch):
    """Offline boxes json -> _load_detection_boxes -> evaluate with
    USE_GT_BBOX=False: perfect keypoints on detector boxes give AP=100."""
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=4, people_per_frame=2)
    cfg = _cfg_for(json_dir, img_dir, annot_dir)

    from otpose_tpu.data.posetrack import PoseTrackDataset

    gt = PoseTrackDataset(cfg, "validate")
    # image path -> GT boxes (sanitized xywh) + joints
    by_image = {}
    for rec in gt.data:
        by_image.setdefault(rec["image"], []).append(rec)

    class StubDetector:
        def __init__(self, *a, **k):
            pass

        def detect_persons(self, img_rgb):
            return list(self._boxes)

    import otpose_tpu.detector.yolov3 as ymod
    import tools.generate_boxes as gb

    stub = StubDetector()
    monkeypatch.setattr(ymod, "YoloV3Detector", lambda *a, **k: stub)

    # drive tools/generate_boxes.py main() with per-image GT boxes
    out_json = str(tmp_path / "val_boxes.json")

    def fake_imread(path):
        recs = by_image.get(path)
        stub._boxes = [list(map(float, r["box"])) + [0.97] for r in recs] \
            if recs else []
        return np.zeros((16, 16, 3), np.uint8)

    monkeypatch.setattr(gb, "__name__", "tools.generate_boxes", raising=False)
    monkeypatch.setattr(sys, "argv",
                        ["generate_boxes.py", "--json_dir", json_dir,
                         "--img_dir", img_dir, "--out", out_json])
    monkeypatch.setattr(cv2, "imread", fake_imread)
    gb.main()

    boxes_blob = json.load(open(out_json))
    assert boxes_blob and all(b["category_id"] == 1 for b in boxes_blob)
    assert all(len(b["bbox"]) == 4 for b in boxes_blob)

    # detection-mode dataset (ref gate: phase=='test' and not USE_GT_BBOX)
    cfg.TEST.USE_GT_BBOX = False
    cfg.TEST.COCO_BBOX_FILE = out_json
    cfg.TEST.ANNOT_DIR = annot_dir
    cfg.TEST.IMAGE_THRE = 0.1
    ds = PoseTrackDataset(cfg, "test")
    assert len(ds) == len(boxes_blob)
    rec = ds.data[0]
    assert rec["score"] == pytest.approx(0.97)
    assert rec["nframes"] > 0

    # perfect predictions: GT joints of the nearest GT record per detection
    n = len(ds)
    preds = np.zeros((n, 17, 3))
    boxes = np.zeros((n, 6))
    filenames_map = {}
    for i, det in enumerate(ds.data):
        cands = by_image[det["image"]]
        d = [np.linalg.norm(det["center"] - c["center"]) for c in cands]
        src = cands[int(np.argmin(d))]
        preds[i, :, :2] = src["joints_3d"][:, :2]
        preds[i, :, 2] = 0.95
        boxes[i, 0:2] = det["center"]
        boxes[i, 2:4] = det["scale"]
        boxes[i, 4] = np.prod(det["scale"] * 200)
        boxes[i, 5] = det["score"]
        filenames_map.setdefault(det["image"], []).append(i)

    name_value, mean_ap = ds.evaluate(cfg, preds, str(tmp_path / "out"),
                                      boxes, filenames_map)
    assert mean_ap == pytest.approx(100.0)


def _write_synthetic_weights_variant(path, variant, seed=0):
    rng = np.random.RandomState(seed)
    chunks = [np.asarray([0, 2, 0, 0, 0], np.int32).tobytes()]
    for cin, spec in Y._conv_specs_in_order(variant):
        co, k = spec.out_ch, spec.kernel
        if spec.bn:
            for _ in range(4):
                chunks.append(rng.randn(co).astype(np.float32).tobytes())
        else:
            chunks.append(rng.randn(co).astype(np.float32).tobytes())
        chunks.append(rng.randn(co, cin, k, k).astype(np.float32).tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


def test_tiny_program_matches_cfg():
    """yolov3-tiny layer program: 13 convs, channel plumbing as in the
    official cfg (ref: config/yolov3-tiny.cfg)."""
    specs = Y._conv_specs_in_order("yolov3-tiny")
    assert len(specs) == 13
    assert [s.out_ch for _, s in specs] == [
        16, 32, 64, 128, 256, 512, 1024, 256, 512, 255, 128, 256, 255]
    # route_cat l8: conv after upsample sees 128 + 256 input channels
    cins = [cin for cin, _ in specs]
    assert cins[11] == 128 + 256
    # linear heads carry bias, everything else batchnorm
    assert [s.bn for _, s in specs].count(False) == 2


def test_tiny_darknet_weights_roundtrip(tmp_path):
    path = str(tmp_path / "tiny.weights")
    _write_synthetic_weights_variant(path, "yolov3-tiny")
    loaded = Y.load_darknet_weights(path, "yolov3-tiny")
    assert len(loaded) == 13
    # a full-variant read of the tiny blob must fail the exhaustion check
    with pytest.raises((AssertionError, ValueError)):
        Y.load_darknet_weights(path)


def test_tiny_forward_shapes_random_weights():
    import jax.numpy as jnp

    weights = Y.init_random_weights(seed=0, variant="yolov3-tiny")
    x = jnp.zeros((1, 64, 64, 3))
    out = np.asarray(Y.yolo_forward(weights, x, img_size=64,
                                    variant="yolov3-tiny"))
    # two heads at strides 32/16 on a 64px input: 4+16 cells x 3 anchors
    assert out.shape == (1, (4 + 16) * 3, 85)
    assert np.isfinite(out).all()
    assert (out[..., 4] >= 0).all() and (out[..., 4] <= 1).all()


def test_tiny_stride1_maxpool_keeps_size():
    """The cfg's size-2/stride-1 maxpool (layer 11) must not change H/W —
    darknet pads right/bottom; spatial dims must survive to the stride-32
    head or the weights won't load into the right grid."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    padded = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                     constant_values=-jnp.inf)
    y = jax.lax.reduce_window(padded, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
    assert y.shape == x.shape
    # interior: max over the 2x2 window anchored top-left
    np.testing.assert_array_equal(np.asarray(y)[0, :, :, 0][:3, :3],
                                  np.asarray(x)[0, 1:, 1:, 0])


def test_yolo_forward_matches_reference_darknet(tmp_path):
    """Graph differential vs the reference's torch Darknet: the reference
    builds its cfg-file model (ref: object_detector/YOLOv3/models.py:234-276),
    we randomize its params/BN stats, save a real .weights binary with ITS
    writer (models.py:335+), load that file with OUR loader, and the decoded
    (B, N, 85) outputs must match — pinning routes, shortcuts, BN-eval conv
    stacks, and all three anchor-decode heads (order: stride 32, 16, 8)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from tests.helpers.reference import import_reference_module

    models = import_reference_module("object_detector.YOLOv3.models")
    ref = models.Darknet("/root/reference/object_detector/YOLOv3/config/yolov3.cfg")

    g = np.random.RandomState(0)
    with torch.no_grad():
        for _, p in sorted(ref.named_parameters()):
            if p.ndim == 4:     # conv kernels: keep fan-in scaling so the
                scale = (2.0 / (p.shape[1] * p.shape[2] * p.shape[3])) ** 0.5
            else:
                scale = 0.1
            p.copy_(torch.from_numpy(
                g.randn(*p.shape).astype(np.float32) * scale))
        # BN affine near identity so activations keep healthy magnitude
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(1.0 + 0.1 * torch.from_numpy(
                    g.randn(*m.weight.shape).astype(np.float32)))
        # tame the three no-BN detection-head convs: raw w/h logits feed
        # exp() in the decode, and unnormalized random heads overflow to inf
        for module_def, module in zip(ref.module_defs, ref.module_list):
            if module_def["type"] == "convolutional" and \
                    not int(module_def.get("batch_normalize", 0)):
                module[0].weight.mul_(0.05)
                module[0].bias.mul_(0.05)

    # CALIBRATE the BN running stats: with purely random weights the 75-layer
    # stack explodes to inf (leaky-relu gains compound); a momentum-1
    # train-mode pass writes each layer's true batch statistics into the
    # running buffers, so the eval forward is self-normalized at every layer
    img = 64
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.momentum = 1.0
        ref.train()
        ref(torch.from_numpy(g.randn(4, 3, img, img).astype(np.float32)))

    wpath = str(tmp_path / "rand.weights")
    ref.header_info = np.zeros(5, dtype=np.int32)  # loader reads 5x int32
    ref.save_weights(wpath)

    for m in ref.modules():
        if isinstance(m, models.YOLOLayer):
            m.image_dim = img  # cfg bakes 416; evaluate both sides at 64
    ref.eval()
    x = g.randn(1, 3, img, img).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    w = Y.load_darknet_weights(wpath)
    out = np.asarray(Y.yolo_forward(
        w, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), img_size=img))
    assert out.shape == out_ref.shape == (1, (4 + 16 + 64) * 3, 85)

    # map our per-head flattening (grid-major: y, x, anchor) onto the
    # reference's (anchor-major: anchor, y, x — models.py:159-163 view).
    # Ordering is an internal layout choice — NMS consumes the set — so the
    # differential compares matched cells, not raw indices.
    parts = []
    for g_, sl in [(2, slice(0, 12)), (4, slice(12, 60)), (8, slice(60, 252))]:
        h = out[:, sl].reshape(1, g_, g_, 3, 85)
        parts.append(np.transpose(h, (0, 3, 1, 2, 4)).reshape(1, -1, 85))
    out = np.concatenate(parts, axis=1)

    # boxes are in pixels (<= ~img scale), obj/cls in [0, 1]; measured
    # envelope 1.8e-3 / 1.7e-6 (f32 conv stacks, torch vs XLA)
    box_diff = np.abs(out[..., :4] - out_ref[..., :4]).max()
    prob_diff = np.abs(out[..., 4:] - out_ref[..., 4:]).max()
    assert box_diff <= 2e-2, box_diff
    assert prob_diff <= 1e-4, prob_diff
    # non-degenerate: probabilities must actually vary across cells
    assert np.std(out_ref[..., 4]) > 1e-3


def test_nms_matches_reference_implementation():
    """Differential vs the reference's own torch non_max_suppression on a
    random decoded batch (clustered boxes, several classes): same number of
    kept boxes and the same merged coords/conf/class per row.  The
    reference's kept rows are [x1, y1, x2, y2, obj, cls_idx] (6 cols — its
    docstring promises a cls_score column the cat() never adds); ours adds
    cls_score, so the comparison maps columns accordingly."""
    torch = pytest.importorskip("torch")
    from tests.helpers.reference import import_reference_module

    du = import_reference_module("object_detector.YOLOv3.detector_utils")

    rng = np.random.RandomState(7)
    n = 60
    dets = np.zeros((n, 85), np.float32)
    # clustered centers so suppression + merging actually engage
    centers = rng.randint(40, 360, size=(6, 2))
    which = rng.randint(0, len(centers), size=n)
    dets[:, 0:2] = centers[which] + rng.randn(n, 2) * 6
    dets[:, 2:4] = rng.uniform(25, 60, size=(n, 2))
    dets[:, 4] = rng.uniform(0.3, 1.0, size=n)
    cls = rng.randint(0, 3, size=n)
    dets[np.arange(n), 5 + cls] = rng.uniform(0.5, 1.0, size=n)

    ours = Y.non_max_suppression(dets.copy(), conf_thres=0.5, nms_thres=0.4)
    ref_out = du.non_max_suppression(torch.from_numpy(dets.copy())[None],
                                     conf_thres=0.5, nms_thres=0.4)[0]
    assert ref_out is not None
    ref_np = ref_out.numpy()
    assert ours.shape[0] == ref_np.shape[0] > 3
    # same candidate order on both sides -> rows line up directly
    np.testing.assert_allclose(ours[:, :5], ref_np[:, :5], atol=1e-4)
    np.testing.assert_array_equal(ours[:, 6].astype(int),
                                  ref_np[:, 5].astype(int))


def test_preprocess_matches_reference(tmp_path):
    """Pad value (127 after uint8 truncation) + INTER_AREA resize must match
    the reference's preprocess_img_for_yolo tensor exactly."""
    pytest.importorskip("torch")
    from tests.helpers.reference import import_reference_module

    du = import_reference_module("object_detector.YOLOv3.detector_utils")
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (300, 480, 3), dtype=np.uint8)
    ours, _ = Y.preprocess_image(img, img_size=416)
    ref = du.preprocess_img_for_yolo(img, img_size=416).numpy()[0]
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-6)
