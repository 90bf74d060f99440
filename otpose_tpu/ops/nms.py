"""1-D segment NMS / SoftNMS.

ref: thirdparty/utils/csrc/nms_cpu.cpp:19-182 + thirdparty/utils/nms.py
(vendored ActionFormer op; not used by the OTPose train/eval path — kept for
package-API parity).  Host path is vectorized numpy; ``nms_1d_device`` is a
jit-able fixed-size masked variant for on-device post-processing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def nms_1d(segs: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy 1-D NMS; returns kept indices sorted by descending score
    (ref: nms_cpu.cpp:19-58)."""
    segs = np.asarray(segs, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    if segs.size == 0:
        return np.zeros(0, dtype=np.int64)
    x1, x2 = segs[:, 0], segs[:, 1]
    areas = x2 - x1 + 1e-6
    order = np.argsort(-scores, kind="stable")
    keep = np.ones(len(segs), dtype=bool)
    for _i in range(len(order)):
        if not keep[_i]:
            continue
        i = order[_i]
        xx1 = np.maximum(x1[i], x1[order[_i + 1:]])
        xx2 = np.minimum(x2[i], x2[order[_i + 1:]])
        inter = np.maximum(0.0, xx2 - xx1)
        ovr = inter / (areas[i] + areas[order[_i + 1:]] - inter)
        keep[_i + 1:] &= ~(ovr >= iou_threshold)
    return order[keep]


def softnms_1d(segs: np.ndarray, scores: np.ndarray, *, iou_threshold: float = 0.5,
               sigma: float = 0.5, min_score: float = 0.001, method: int = 2):
    """SoftNMS with linear/gaussian decay (ref: nms_cpu.cpp:67-160).
    Returns (sorted_segs, sorted_scores, original_indices)."""
    x1 = np.asarray(segs, dtype=np.float64)[:, 0].copy()
    x2 = np.asarray(segs, dtype=np.float64)[:, 1].copy()
    sc = np.asarray(scores, dtype=np.float64).copy()
    areas = x2 - x1 + 1e-6
    inds = np.arange(len(sc))
    n = len(sc)
    out = []
    i = 0
    while i < n:
        max_pos = i + int(np.argmax(sc[i:n]))
        for arr in (x1, x2, sc, areas, inds):
            arr[i], arr[max_pos] = arr[max_pos], arr[i]
        out.append((x1[i], x2[i], sc[i], inds[i]))
        xx1 = np.maximum(x1[i], x1[i + 1:n])
        xx2 = np.minimum(x2[i], x2[i + 1:n])
        inter = np.maximum(0.0, xx2 - xx1)
        ovr = inter / (areas[i] + areas[i + 1:n] - inter)
        if method == 0:
            weight = np.where(ovr >= iou_threshold, 0.0, 1.0)
        elif method == 1:
            weight = np.where(ovr >= iou_threshold, 1.0 - ovr, 1.0)
        else:
            weight = np.exp(-(ovr * ovr) / sigma)
        sc[i + 1:n] *= weight
        # compact out segments that fell below min_score
        j = i + 1
        while j < n:
            if sc[j] < min_score:
                for arr in (x1, x2, sc, areas, inds):
                    arr[j] = arr[n - 1]
                n -= 1
            else:
                j += 1
        i += 1
    out = np.asarray(out, dtype=np.float64).reshape(-1, 4)
    return out[:, :2], out[:, 2], out[:, 3].astype(np.int64)


@functools.partial(jax.jit, static_argnames=("max_keep",))
def nms_1d_device(segs: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
                  max_keep: int = 0):
    """Fixed-size on-device greedy NMS: returns a keep mask over the inputs.
    Static shapes (masking, no dynamic output) keep it XLA-friendly."""
    n = segs.shape[0]
    x1, x2 = segs[:, 0], segs[:, 1]
    areas = x2 - x1 + 1e-6
    order = jnp.argsort(-scores, stable=True)

    def body(_i, keep):
        i = order[_i]
        active = keep[_i]
        xx1 = jnp.maximum(x1[i], x1[order])
        xx2 = jnp.minimum(x2[i], x2[order])
        inter = jnp.maximum(0.0, xx2 - xx1)
        ovr = inter / (areas[i] + areas[order] - inter)
        suppress = (ovr >= iou_threshold) & (jnp.arange(n) > _i)
        return jnp.where(active, keep & ~suppress, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones(n, dtype=bool))
    if max_keep:
        # cap survivors at the max_keep HIGHEST-SCORING kept segments —
        # keep_sorted is in descending-score order, so a cumulative count
        # masks everything past the cap (static shapes preserved)
        keep_sorted &= jnp.cumsum(keep_sorted) <= max_keep
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep
