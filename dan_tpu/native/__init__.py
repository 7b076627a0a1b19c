"""On-demand build + ctypes loader for the native eval kernels.

Compiles overlaps.cc with g++ into a per-user cache directory the first
time it's needed (no pip/apt — the toolchain is ambient), then loads it via
ctypes.  Callers treat `load()` returning None as 'use the numpy fallback'.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "overlaps.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(src: str, out: str) -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-o",
        out,
        src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> Optional[ctypes.CDLL]:
    """Build (once, content-hashed) and load the native library."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            cache_dir = os.environ.get(
                "DAN_TPU_NATIVE_CACHE",
                os.path.expanduser("~/.cache/dan_tpu_native"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"overlaps_{digest}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                _build(_SRC, tmp)
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            lib.bbox_overlaps.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.image_eval.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception as e:  # toolchain/permissions missing -> fallback
            print(f"[dan_tpu.native] build unavailable: {e}", file=sys.stderr)
            _lib = None
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bbox_overlaps(dets: np.ndarray, gts: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float64)
    gts = np.ascontiguousarray(gts, np.float64)
    out = np.empty((len(dets), len(gts)), np.float64)
    lib.bbox_overlaps(
        _ptr(dets, ctypes.c_double),
        len(dets),
        _ptr(gts, ctypes.c_double),
        len(gts),
        _ptr(out, ctypes.c_double),
    )
    return out


def image_eval(
    dets: np.ndarray, gts: np.ndarray, ignore: np.ndarray, iou_thresh: float
):
    """Native greedy matcher; returns (pred_recall, proposal) or None."""
    lib = load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float64)
    gts = np.ascontiguousarray(gts, np.float64)
    ignore = np.ascontiguousarray(ignore, np.uint8)
    n, m = len(dets), len(gts)
    pred_recall = np.empty((n,), np.int64)
    proposal = np.empty((n,), np.int64)
    lib.image_eval(
        _ptr(dets, ctypes.c_double),
        n,
        _ptr(gts, ctypes.c_double),
        m,
        _ptr(ignore, ctypes.c_uint8),
        iou_thresh,
        _ptr(pred_recall, ctypes.c_int64),
        _ptr(proposal, ctypes.c_int64),
    )
    return pred_recall, proposal
