"""YOLOv3 person detector for offline box generation.

ref: object_detector/YOLOv3/ (cfg-file-driven Darknet graph + .weights
loader + NMS, models.py:14-354, detector_utils.py:12-365,
detector_yolov3.py:17-98).  The reference parses darknet .cfg files at
runtime; here the standard YOLOv3 graph is expressed directly as an ordered
layer program (same layer order as the official cfg, so official
``yolov3.weights`` files load sequentially), and inference is one jit'd JAX
function.

Used to produce the precomputed person-box jsons consumed by
``PoseTrackDataset._load_detection_boxes`` (ref: PoseTrackDataset.py:176-226).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the standard YOLOv3 anchor set (official cfg ordering: head1 = stride 32)
ANCHORS = {
    0: [(116, 90), (156, 198), (373, 326)],
    1: [(30, 61), (62, 45), (59, 119)],
    2: [(10, 13), (16, 30), (33, 23)],
}

# yolov3-tiny masks: head1 = 3,4,5; head2 = 1,2,3 (the official cfg reuses
# anchor 3 — a darknet quirk, reproduced; ref: config/yolov3-tiny.cfg:150,199)
TINY_ANCHORS = {
    0: [(81, 82), (135, 169), (344, 319)],
    1: [(23, 27), (37, 58), (81, 82)],
}

_VARIANT_ANCHORS = {"yolov3": ANCHORS, "yolov3-tiny": TINY_ANCHORS}


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    out_ch: int
    kernel: int
    stride: int = 1
    bn: bool = True       # batchnorm + leaky; False => linear conv with bias


# ('conv', ConvSpec) | ('res', n_blocks, mid, out) | ('route', [tap names])
# | ('up',) | ('save', name) | ('yolo', head_idx) | ('max', size, stride)
def _program(variant: str = "yolov3") -> List[tuple]:
    if variant == "yolov3-tiny":
        return _program_tiny()
    if variant != "yolov3":
        raise ValueError(f"unknown YOLO variant {variant!r}")
    p: List[tuple] = [
        ("conv", ConvSpec(32, 3)),
        ("conv", ConvSpec(64, 3, 2)), ("res", 1, 32, 64),
        ("conv", ConvSpec(128, 3, 2)), ("res", 2, 64, 128),
        ("conv", ConvSpec(256, 3, 2)), ("res", 8, 128, 256), ("save", "r36"),
        ("conv", ConvSpec(512, 3, 2)), ("res", 8, 256, 512), ("save", "r61"),
        ("conv", ConvSpec(1024, 3, 2)), ("res", 4, 512, 1024),
    ]
    # detection head 1 (stride 32)
    p += [("conv", ConvSpec(512, 1)), ("conv", ConvSpec(1024, 3)),
          ("conv", ConvSpec(512, 1)), ("conv", ConvSpec(1024, 3)),
          ("conv", ConvSpec(512, 1)), ("save", "h1"),
          ("conv", ConvSpec(1024, 3)), ("conv", ConvSpec(255, 1, bn=False)),
          ("yolo", 0),
          ("route", ["h1"]), ("conv", ConvSpec(256, 1)), ("up",),
          ("route_cat", "r61")]
    # head 2 (stride 16)
    p += [("conv", ConvSpec(256, 1)), ("conv", ConvSpec(512, 3)),
          ("conv", ConvSpec(256, 1)), ("conv", ConvSpec(512, 3)),
          ("conv", ConvSpec(256, 1)), ("save", "h2"),
          ("conv", ConvSpec(512, 3)), ("conv", ConvSpec(255, 1, bn=False)),
          ("yolo", 1),
          ("route", ["h2"]), ("conv", ConvSpec(128, 1)), ("up",),
          ("route_cat", "r36")]
    # head 3 (stride 8)
    p += [("conv", ConvSpec(128, 1)), ("conv", ConvSpec(256, 3)),
          ("conv", ConvSpec(128, 1)), ("conv", ConvSpec(256, 3)),
          ("conv", ConvSpec(128, 1)),
          ("conv", ConvSpec(256, 3)), ("conv", ConvSpec(255, 1, bn=False)),
          ("yolo", 2)]
    return p


def _program_tiny() -> List[tuple]:
    """yolov3-tiny: 13 convs, 6 maxpools, 2 heads
    (ref: config/yolov3-tiny.cfg; layer numbering per darknet cfg order)."""
    p: List[tuple] = [
        ("conv", ConvSpec(16, 3)), ("max", 2, 2),
        ("conv", ConvSpec(32, 3)), ("max", 2, 2),
        ("conv", ConvSpec(64, 3)), ("max", 2, 2),
        ("conv", ConvSpec(128, 3)), ("max", 2, 2),
        ("conv", ConvSpec(256, 3)), ("save", "l8"),   # cfg layer 8
        ("max", 2, 2),
        ("conv", ConvSpec(512, 3)),
        ("max", 2, 1),                                 # stride-1 pool, same-size
        ("conv", ConvSpec(1024, 3)),
        ("conv", ConvSpec(256, 1)), ("save", "l13"),  # route -4 target
        ("conv", ConvSpec(512, 3)),
        ("conv", ConvSpec(255, 1, bn=False)),
        ("yolo", 0),
        ("route", ["l13"]), ("conv", ConvSpec(128, 1)), ("up",),
        ("route_cat", "l8"),
        ("conv", ConvSpec(256, 3)),
        ("conv", ConvSpec(255, 1, bn=False)),
        ("yolo", 1),
    ]
    return p


def _conv_specs_in_order(variant: str = "yolov3") -> List[Tuple[int, ConvSpec]]:
    """All convs in darknet weight-file order with their input channels."""
    specs = []
    ch = 3
    saves: Dict[str, int] = {}
    stack = []  # channel tracker
    for op in _program(variant):
        if op[0] == "conv":
            specs.append((ch, op[1]))
            ch = op[1].out_ch
        elif op[0] == "res":
            _, n, mid, out = op
            for _ in range(n):
                specs.append((ch, ConvSpec(mid, 1)))
                specs.append((mid, ConvSpec(out, 3)))
                ch = out
        elif op[0] == "save":
            saves[op[1]] = ch
        elif op[0] == "route":
            ch = saves[op[1][0]]
        elif op[0] == "route_cat":
            ch = ch + saves[op[1]]
        elif op[0] in ("up", "yolo", "max"):
            pass
    return specs


def load_darknet_weights(path: str, variant: str = "yolov3") -> List[dict]:
    """Official .weights binary -> per-conv param dicts in program order
    (layout per conv: [bn_bias, bn_scale, bn_mean, bn_var] or [bias], then
    OIHW kernel — ref: models.py:286-331)."""
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)  # noqa: F841
        buf = np.fromfile(f, dtype=np.float32)
    ptr = 0
    out = []
    for cin, spec in _conv_specs_in_order(variant):
        p: dict = {}
        co = spec.out_ch
        if spec.bn:
            p["bn_bias"] = buf[ptr:ptr + co]; ptr += co
            p["bn_scale"] = buf[ptr:ptr + co]; ptr += co
            p["bn_mean"] = buf[ptr:ptr + co]; ptr += co
            p["bn_var"] = buf[ptr:ptr + co]; ptr += co
        else:
            p["bias"] = buf[ptr:ptr + co]; ptr += co
        n_w = co * cin * spec.kernel * spec.kernel
        w = buf[ptr:ptr + n_w].reshape(co, cin, spec.kernel, spec.kernel)
        ptr += n_w
        p["weight"] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        out.append(p)
    assert ptr == len(buf), f"weight file mismatch: used {ptr} of {len(buf)}"
    return out


def init_random_weights(seed: int = 0, variant: str = "yolov3") -> List[dict]:
    """Random weights with the same structure (for tests without a
    yolov3.weights file)."""
    rng = np.random.RandomState(seed)
    out = []
    for cin, spec in _conv_specs_in_order(variant):
        co, k = spec.out_ch, spec.kernel
        p = {"weight": (rng.randn(k, k, cin, co) * 0.01).astype(np.float32)}
        if spec.bn:
            p["bn_bias"] = np.zeros(co, np.float32)
            p["bn_scale"] = np.ones(co, np.float32)
            p["bn_mean"] = np.zeros(co, np.float32)
            p["bn_var"] = np.ones(co, np.float32)
        else:
            p["bias"] = np.zeros(co, np.float32)
        out.append(p)
    return out


def _conv(x, p, spec: ConvSpec):
    pad = spec.kernel // 2
    if spec.stride > 1:
        # darknet pads top-left-biased for stride-2 (size/2 exactly)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        pad_cfg = [(0, 0), (0, 0)]
    else:
        pad_cfg = [(pad, pad), (pad, pad)]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["weight"]), (spec.stride, spec.stride), pad_cfg,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if spec.bn:
        inv = jax.lax.rsqrt(jnp.asarray(p["bn_var"]) + 1e-5)
        y = (y - p["bn_mean"]) * (inv * p["bn_scale"]) + p["bn_bias"]
        y = jnp.where(y > 0, y, 0.1 * y)  # leaky relu
    else:
        y = y + p["bias"]
    return y


def _decode_head(feat: jnp.ndarray, head_idx: int, img_size: int,
                 variant: str = "yolov3") -> jnp.ndarray:
    """(B, g, g, 255) raw head -> (B, g*g*3, 85) [cx, cy, w, h, obj, cls...]
    (ref: models.py:112-235 YOLOLayer)."""
    b, gh, gw, _ = feat.shape
    stride = img_size // gh
    feat = feat.reshape(b, gh, gw, 3, 85)
    xs = jnp.arange(gw, dtype=jnp.float32)
    ys = jnp.arange(gh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    anchors = jnp.asarray(_VARIANT_ANCHORS[variant][head_idx],
                          jnp.float32) / stride
    cx = (jax.nn.sigmoid(feat[..., 0]) + gx[None, :, :, None]) * stride
    cy = (jax.nn.sigmoid(feat[..., 1]) + gy[None, :, :, None]) * stride
    ww = jnp.exp(feat[..., 2]) * anchors[None, None, None, :, 0] * stride
    hh = jnp.exp(feat[..., 3]) * anchors[None, None, None, :, 1] * stride
    obj = jax.nn.sigmoid(feat[..., 4])
    cls = jax.nn.sigmoid(feat[..., 5:])
    out = jnp.concatenate([cx[..., None], cy[..., None], ww[..., None],
                           hh[..., None], obj[..., None], cls], axis=-1)
    return out.reshape(b, gh * gw * 3, 85)


@functools.partial(jax.jit, static_argnames=("img_size", "variant"))
def yolo_forward(weights_flat, x: jnp.ndarray, img_size: int = 416,
                 variant: str = "yolov3") -> jnp.ndarray:
    """x: (B, S, S, 3) in [0, 1] -> (B, N, 85) decoded detections."""
    conv_i = 0
    saves: Dict[str, jnp.ndarray] = {}
    detections = []
    for op in _program(variant):
        if op[0] == "conv":
            x = _conv(x, weights_flat[conv_i], op[1])
            conv_i += 1
        elif op[0] == "res":
            _, n, mid, out_ch = op
            for _ in range(n):
                skip = x
                x = _conv(x, weights_flat[conv_i], ConvSpec(mid, 1)); conv_i += 1
                x = _conv(x, weights_flat[conv_i], ConvSpec(out_ch, 3)); conv_i += 1
                x = x + skip
        elif op[0] == "save":
            saves[op[1]] = x
        elif op[0] == "route":
            x = saves[op[1][0]]
        elif op[0] == "route_cat":
            x = jnp.concatenate([x, saves[op[1]]], axis=-1)
        elif op[0] == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        elif op[0] == "max":
            _, size, stride = op
            if stride == 1:
                # darknet same-size pool: pad right/bottom with -inf
                # (ref: models.py maxpool padding for yolov3-tiny layer 11)
                x = jnp.pad(x, ((0, 0), (0, size - 1), (0, size - 1), (0, 0)),
                            constant_values=-jnp.inf)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, size, size, 1),
                (1, stride, stride, 1), "VALID")
        elif op[0] == "yolo":
            detections.append(_decode_head(x, op[1], img_size, variant))
    return jnp.concatenate(detections, axis=1)


def preprocess_image(img: np.ndarray, img_size: int = 416):
    """Pad to square + resize (ref: detector_utils.py:11-38).
    Returns (tensor (S, S, 3) in [0,1], pad info for rescaling).

    Faithful details: pad value 127.5 (truncates to 127 on the uint8 frames
    the reference feeds) and INTER_AREA resize — the reference's typical
    1080p->416 downscale averages pixels, and INTER_LINEAR instead would
    shift borderline detections across the confidence threshold."""
    import cv2

    h, w = img.shape[:2]
    dim_diff = abs(h - w)
    pad1, pad2 = dim_diff // 2, dim_diff - dim_diff // 2
    if h <= w:
        pad = ((pad1, pad2), (0, 0), (0, 0))
    else:
        pad = ((0, 0), (pad1, pad2), (0, 0))
    padded = np.pad(img, pad, constant_values=127.5)
    side = padded.shape[0]
    resized = cv2.resize(padded, (img_size, img_size),
                         interpolation=cv2.INTER_AREA)
    return resized.astype(np.float32) / 255.0, (pad, side)


def _xywh_to_xyxy(b):
    return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                     b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1)


def _iou_plus1(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one xyxy box vs many, in the reference's +1-pixel convention
    (ref: detector_utils.py:190-220 bbox_iou — widths count inclusive
    endpoints: ``x2 - x1 + 1``)."""
    xx1 = np.maximum(box[0], boxes[:, 0])
    yy1 = np.maximum(box[1], boxes[:, 1])
    xx2 = np.minimum(box[2], boxes[:, 2])
    yy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(xx2 - xx1 + 1, 0, None) * np.clip(yy2 - yy1 + 1, 0, None)
    a1 = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    a2 = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    return inter / (a1 + a2 - inter + 1e-16)


def non_max_suppression(dets: np.ndarray, conf_thres: float = 0.5,
                        nms_thres: float = 0.4) -> np.ndarray:
    """Greedy NMS with confidence-weighted box merging on (N, 85) decoded
    detections (ref: detector_utils.py:253-292).  Returns (M, 7)
    [x1, y1, x2, y2, obj, cls_score, cls_idx].

    Faithful reference semantics: each kept detection's COORDS are the
    obj-confidence-weighted average over the whole suppressed cluster
    (itself included), not the raw top box; suppression uses the +1-pixel
    IoU and matching class labels; candidate order is obj * cls_score
    descending."""
    dets = dets[dets[:, 4] >= conf_thres]
    if len(dets) == 0:
        return np.zeros((0, 7))
    cls_score = dets[:, 5:].max(axis=1)
    cls_idx = dets[:, 5:].argmax(axis=1).astype(np.float64)
    order = np.argsort(-(dets[:, 4] * cls_score))
    boxes = _xywh_to_xyxy(dets[:, :4])[order]
    obj = dets[order, 4]
    scores = cls_score[order]
    labels = cls_idx[order]
    out = []
    while len(boxes):
        invalid = (_iou_plus1(boxes[0], boxes) > nms_thres) & \
            (labels == labels[0])
        w = obj[invalid][:, None]
        merged = (w * boxes[invalid]).sum(axis=0) / w.sum()
        out.append([*merged, obj[0], scores[0], labels[0]])
        boxes, obj, scores, labels = (boxes[~invalid], obj[~invalid],
                                      scores[~invalid], labels[~invalid])
    return np.asarray(out).reshape(-1, 7)


class YoloV3Detector:
    """Person-box detector (ref: detector_yolov3.py:17-98)."""

    def __init__(self, weights_path: Optional[str] = None, img_size: int = 416,
                 conf_thres: float = 0.4, nms_thres: float = 0.4,
                 variant: str = "yolov3"):
        self.img_size = img_size
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self.variant = variant
        if weights_path:
            self.weights = load_darknet_weights(weights_path, variant)
        else:
            self.weights = init_random_weights(variant=variant)

    def detect_persons(self, img_rgb: np.ndarray) -> List[list]:
        """RGB image -> list of [x, y, w, h] person boxes in image coords
        (ref: detector_yolov3.py:58-98)."""
        tensor, (pad, side) = preprocess_image(img_rgb, self.img_size)
        dets = np.asarray(yolo_forward(self.weights, jnp.asarray(tensor[None]),
                                       self.img_size, self.variant))[0]
        kept = non_max_suppression(dets, self.conf_thres, self.nms_thres)
        boxes = []
        scale = side / self.img_size
        for x1, y1, x2, y2, obj, cls_s, cls_i in kept:
            if int(cls_i) != 0:  # person
                continue
            x1, y1 = x1 * scale - pad[1][0], y1 * scale - pad[0][0]
            x2, y2 = x2 * scale - pad[1][0], y2 * scale - pad[0][0]
            boxes.append([float(x1), float(y1), float(x2 - x1), float(y2 - y1),
                          float(obj * cls_s)])
        return boxes
