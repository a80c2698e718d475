"""ctypes wrapper around the native host NMS (native/nms1d.c).

Builds the shared library on first use (gcc, no external deps) and caches it
next to the source. Falls back cleanly if no compiler is available — the
on-device XLA NMS (ops/nms.py) is the production path; this is the host
fallback / cross-check (the reference's single native component, SURVEY.md
§2 #26).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "nms1d.c",
)
_SO = os.path.join(os.path.dirname(_SRC), "libnms1d.so")


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["gcc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        raise NativeUnavailable(f"native NMS build failed: {e}") from e
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.soft_nms_1d.restype = ctypes.c_int64
        lib.soft_nms_1d.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.c_int64, i64p, f32p,
        ]
        lib.hard_nms_1d.restype = ctypes.c_int64
        lib.hard_nms_1d.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
            i64p, f32p,
        ]
        _LIB = lib
    return _LIB


def soft_nms_host(
    segs: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float,
    sigma: float,
    min_score: float,
    method: int = 2,
    max_out: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (selected indices, selected scores) in selection order."""
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = segs.shape[0]
    max_out = n if max_out is None else min(max_out, n)
    out_idx = np.zeros(max_out, np.int64)
    out_scores = np.zeros(max_out, np.float32)
    k = _lib().soft_nms_1d(
        segs, scores, n, iou_threshold, sigma, min_score, method, max_out,
        out_idx, out_scores,
    )
    if k < 0:
        raise RuntimeError("native soft_nms_1d failed")
    return out_idx[:k], out_scores[:k]


def hard_nms_host(
    segs: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float,
    max_out: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = segs.shape[0]
    max_out = n if max_out is None else min(max_out, n)
    out_idx = np.zeros(max_out, np.int64)
    out_scores = np.zeros(max_out, np.float32)
    k = _lib().hard_nms_1d(
        segs, scores, n, iou_threshold, max_out, out_idx, out_scores
    )
    if k < 0:
        raise RuntimeError("native hard_nms_1d failed")
    return out_idx[:k], out_scores[:k]
