"""ctypes bindings for the native host-side ops (native/detection_ops.cc).

The reference builds Cython/CUDA extensions with ``setup.py build_ext``
(SURVEY.md §3.3 "Extension build"); here the native library is a plain C
ABI .so built by ``make -C native`` and auto-built on first import when a
compiler is available.  All functions fall back to numpy implementations
when the library cannot be built (the device path never needs it — these
are host-side oracles/fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdetops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.nms_sorted.argtypes = [f32p, ctypes.c_int, ctypes.c_float,
                               ctypes.c_int, i32p]
    lib.nms_sorted.restype = ctypes.c_int
    lib.bbox_overlaps.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.bbox_overlaps.restype = None
    lib.roi_max_pool.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, f32p, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_int, f32p]
    lib.roi_max_pool.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def nms_cpu(boxes: np.ndarray, scores: np.ndarray, thresh: float,
            max_out: Optional[int] = None) -> List[int]:
    """Greedy NMS, reference cpu_nms semantics.  Returns kept indices into
    the input arrays in score order (stable ties)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.asarray(scores)
    n = len(boxes)
    if max_out is None:
        max_out = n
    order = np.argsort(-scores, kind="stable").astype(np.int64)
    lib = _load()
    if lib is None:
        from trcnn.ops.nms import nms_oracle_numpy
        return nms_oracle_numpy(boxes, scores, thresh)[:max_out]
    sorted_boxes = np.ascontiguousarray(boxes[order])
    keep = np.empty(n, np.int32)
    k = lib.nms_sorted(sorted_boxes, n, float(thresh), int(max_out), keep)
    return [int(order[i]) for i in keep[:k]]


def bbox_overlaps_cpu(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(N, K) pairwise IoU, reference bbox_overlaps semantics."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    lib = _load()
    if lib is None:
        import jax.numpy as jnp
        from trcnn.ops.boxes import box_iou
        return np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(query)))
    out = np.empty((len(boxes), len(query)), np.float32)
    lib.bbox_overlaps(boxes, len(boxes), query, len(query), out)
    return out


def roi_max_pool_cpu(feat: np.ndarray, rois: np.ndarray,
                     out_size: int = 7,
                     spatial_scale: float = 1.0 / 16.0) -> np.ndarray:
    """(R, out, out, C) Caffe ROIPooling forward on HWC features."""
    feat = np.ascontiguousarray(feat, np.float32)
    rois = np.ascontiguousarray(rois, np.float32)
    lib = _load()
    if lib is None:
        from trcnn.ops.roi_pool import roi_max_pool_oracle_numpy
        return roi_max_pool_oracle_numpy(feat, rois, out_size, spatial_scale)
    h, w, c = feat.shape
    r = len(rois)
    out = np.empty((r, out_size, out_size, c), np.float32)
    lib.roi_max_pool(feat, h, w, c, rois, r, float(spatial_scale),
                     int(out_size), out)
    return out
