"""ctypes bindings for the native C++ IO core (native/otpose_io.cpp).

Falls back gracefully (``is_available() == False``) when the shared library
has not been built; callers then use cv2/numpy paths.  Build with
``make -C native``.
"""

from __future__ import annotations

import ctypes
import os.path as osp
from typing import Sequence, Tuple

import numpy as np

_LIB_PATH = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                     "native", "libotpose_io.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.decode_jpeg_batch.restype = ctypes.c_int
    lib.decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.warp_normalize_batch.restype = None
    lib.warp_normalize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int]
    lib.generate_targets_batch.restype = None
    lib.generate_targets_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_jpeg_batch(paths: Sequence[str], max_h: int, max_w: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Parallel JPEG decode -> ((N, max_h, max_w, 3) u8 RGB, hs, ws, n_fail)."""
    lib = _load()
    n = len(paths)
    out = np.zeros((n, max_h, max_w, 3), dtype=np.uint8)
    hs = np.zeros(n, dtype=np.int32)
    ws = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.decode_jpeg_batch(arr, n, _ptr(out, ctypes.c_uint8),
                                  max_h, max_w, _ptr(hs, ctypes.c_int),
                                  _ptr(ws, ctypes.c_int))
    return out, hs, ws, int(fails)


def warp_normalize_batch(imgs: np.ndarray, hs: np.ndarray, ws: np.ndarray,
                         inv_mats: np.ndarray, out_h: int, out_w: int
                         ) -> np.ndarray:
    """(N, Hm, Wm, 3) u8 + (N, 2, 3) inverse matrices -> (N, out_h, out_w, 3)
    normalized f32 (cv2.warpAffine INTER_LINEAR semantics)."""
    lib = _load()
    n, in_h, in_w, _ = imgs.shape
    imgs = np.ascontiguousarray(imgs)
    inv = np.ascontiguousarray(inv_mats.reshape(n, 6), dtype=np.float64)
    out = np.empty((n, out_h, out_w, 3), dtype=np.float32)
    hs = np.ascontiguousarray(hs, dtype=np.int32)
    ws = np.ascontiguousarray(ws, dtype=np.int32)
    lib.warp_normalize_batch(_ptr(imgs, ctypes.c_uint8), _ptr(hs, ctypes.c_int),
                             _ptr(ws, ctypes.c_int), n, in_h, in_w,
                             _ptr(inv, ctypes.c_double), _ptr(out, ctypes.c_float),
                             out_h, out_w)
    return out


def generate_targets_batch(joints: np.ndarray, vis: np.ndarray, sigma: float,
                           stride_x: float, stride_y: float, hm_w: int,
                           hm_h: int) -> Tuple[np.ndarray, np.ndarray]:
    """(N, J, 2) f64 joints + (N, J) vis -> ((N, J, hm_h, hm_w) targets,
    (N, J) weights), reference semantics (utils/heatmap.py:48-105)."""
    lib = _load()
    n, j, _ = joints.shape
    joints = np.ascontiguousarray(joints, dtype=np.float64)
    vis = np.ascontiguousarray(vis, dtype=np.float32)
    target = np.empty((n, j, hm_h, hm_w), dtype=np.float32)
    weight = np.empty((n, j), dtype=np.float32)
    lib.generate_targets_batch(_ptr(joints, ctypes.c_double),
                               _ptr(vis, ctypes.c_float), n, j,
                               float(sigma), float(stride_x), float(stride_y),
                               hm_w, hm_h, _ptr(target, ctypes.c_float),
                               _ptr(weight, ctypes.c_float))
    return target, weight
