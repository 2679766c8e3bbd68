"""ctypes bindings for the native preprocessing library.

Build once with :func:`build` (plain g++, no extra deps); all call sites
fall back to the NumPy/cv2 path when the shared object is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libvidsgg_native.so")
_LIB = None


def build(force: bool = False) -> str:
    """Compile preprocess.cpp -> libvidsgg_native.so."""
    src = os.path.join(_HERE, "preprocess.cpp")
    if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", src, "-o", _SO],
            check=True,
        )
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        if not os.path.exists(_SO):
            raise FileNotFoundError(
                "native library not built; run vidsgg.data.native.build()"
            )
        _LIB = ctypes.CDLL(_SO)
        _LIB.vidsgg_prep_frames.restype = ctypes.c_float
        _LIB.vidsgg_prep_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        _LIB.vidsgg_bbox_overlaps.restype = None
        _LIB.vidsgg_bbox_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
    return _LIB


def available() -> bool:
    return os.path.exists(_SO)


def prep_frames(frames_u8: np.ndarray, target_min_side: int, means,
                out_h: int, out_w: int):
    """[N, H, W, 3] uint8 BGR -> ([N, out_h, out_w, 3] float32, scale)."""
    lib = _lib()
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    n, h, w, _ = frames_u8.shape
    out = np.zeros((n, out_h, out_w, 3), np.float32)
    means_arr = np.asarray(means, np.float32)
    scale = lib.vidsgg_prep_frames(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, target_min_side,
        means_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w,
    )
    return out, float(scale)


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = _lib()
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.zeros((len(boxes), len(query)), np.float32)
    lib.vidsgg_bbox_overlaps(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(boxes),
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(query),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
