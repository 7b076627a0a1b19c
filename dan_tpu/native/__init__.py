"""On-demand build + ctypes loaders for the native components.

Two libraries live here, each compiled with g++ into a per-user cache
directory (content-hashed) the first time it's needed — no pip/apt, the
toolchain is ambient — then loaded via ctypes:

- overlaps.cc — eval hot loops (IoU matrix, greedy gt matching) for the
  WIDER AP protocol (the official tool's Cython extension equivalent).
- loader.cc — the data-loader hot path: threaded JPEG window-decode
  straight into the (B, C, C, 3) batch canvases (the reference's C++
  tf.data input-pipeline equivalent), linked against the system libjpeg.

Callers treat a loader returning None as 'use the Python fallback'.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_lock = threading.Lock()
_libs: dict = {}  # name -> CDLL | None (None = build failed, don't retry)


def _build(src: str, out: str, link_flags: Sequence[str]) -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, src]
    cmd += list(link_flags)
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib(name: str, link_flags: Sequence[str] = ()) -> Optional[ctypes.CDLL]:
    """Build (once, content-hashed) and load native/<name>.cc."""
    with _lock:
        if name in _libs:
            return _libs[name]
        src = os.path.join(os.path.dirname(__file__), f"{name}.cc")
        try:
            # Key the cache on toolchain + machine too: -march=native
            # binaries from a different host (shared cache dir, restored
            # image) would SIGILL instead of rebuilding.
            try:
                gxx = subprocess.run(
                    ["g++", "--version"], capture_output=True, text=True
                ).stdout.splitlines()[0]
            except Exception:
                gxx = "unknown"
            key = os.uname().machine + "|" + gxx + "|"
            with open(src, "rb") as f:
                digest = hashlib.sha256(
                    key.encode() + f.read()
                ).hexdigest()[:16]
            cache_dir = os.environ.get(
                "DAN_TPU_NATIVE_CACHE",
                os.path.expanduser("~/.cache/dan_tpu_native"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"{name}_{digest}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                _build(src, tmp, link_flags)
                os.replace(tmp, so_path)
            _libs[name] = ctypes.CDLL(so_path)
        except Exception as e:  # toolchain/permissions missing -> fallback
            print(f"[dan_tpu.native] {name} unavailable: {e}", file=sys.stderr)
            _libs[name] = None
        return _libs[name]


def load() -> Optional[ctypes.CDLL]:
    """The eval-kernel library (overlaps.cc)."""
    lib = _load_lib("overlaps")
    if lib is not None and not getattr(lib, "_sigs_set", False):
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
        lib._sigs_set = True
    return lib


def load_loader() -> Optional[ctypes.CDLL]:
    """The JPEG data-loader library (loader.cc, links libjpeg)."""
    lib = _load_lib("loader", link_flags=("-ljpeg",))
    if lib is not None and not getattr(lib, "_sigs_set", False):
        lib.dan_jpeg_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dan_jpeg_dims.restype = ctypes.c_int
        lib.dan_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_int,
        ] + [ctypes.POINTER(ctypes.c_int)] * 6 + [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dan_decode_batch.restype = None
        lib._sigs_set = True
    return lib


def jpeg_dims(buf: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None (bad file / no lib)."""
    lib = load_loader()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.dan_jpeg_dims(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if rc == 0 else None


def jpeg_exif_orientation(buf: bytes) -> Optional[int]:
    """EXIF Orientation tag (1..8) from JPEG bytes, or None if absent.

    libjpeg ignores EXIF, but cv2.imread applies it — so the native decode
    path must detect a non-default orientation and hand such images to the
    cv2 fallback, keeping the two paths geometrically identical."""
    try:
        if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
            return None
        i = 2
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                return None
            # Any number of 0xFF fill bytes may pad a marker (JPEG spec);
            # treat runs of 0xFF as one marker prefix.
            while i + 4 <= len(buf) and buf[i + 1] == 0xFF:
                i += 1
            marker = buf[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xDA:  # start of scan: no APP1 ahead
                return None
            seg_len = int.from_bytes(buf[i + 2 : i + 4], "big")
            if marker == 0xE1 and buf[i + 4 : i + 10] == b"Exif\x00\x00":
                tiff = i + 10
                order = buf[tiff : tiff + 2]
                if order == b"II":
                    end = "little"
                elif order == b"MM":
                    end = "big"
                else:
                    return None

                def u16(off):
                    return int.from_bytes(buf[off : off + 2], end)

                def u32(off):
                    return int.from_bytes(buf[off : off + 4], end)

                ifd = tiff + u32(tiff + 4)
                n = u16(ifd)
                for e in range(n):
                    entry = ifd + 2 + 12 * e
                    if entry + 12 > len(buf):
                        return None
                    if u16(entry) == 0x0112:  # Orientation
                        # Trust the value only for a well-formed tag:
                        # type 3 (SHORT), count 1.  A LONG-typed or
                        # malformed tag would read the wrong bytes (e.g.
                        # big-endian LONG -> 0 -> 'orientation 1' -> a
                        # rotated image decoded natively, mis-aligning gt
                        # boxes).  Return a non-1 sentinel instead so the
                        # caller takes the cv2 fallback — the safe
                        # direction.
                        if u16(entry + 2) == 3 and u32(entry + 4) == 1:
                            return u16(entry + 8)
                        return -1  # truthy non-1: pipeline's `or 1` guard
                        # maps 0/None to 'orientation 1' (native path), so
                        # the unknown sentinel must survive it
                return None
            i += 2 + seg_len
        return None
    except Exception:
        return None


def decode_batch_into(
    bufs: Sequence[bytes],
    src_x: np.ndarray,
    src_y: np.ndarray,
    dst_x: np.ndarray,
    dst_y: np.ndarray,
    win_w: np.ndarray,
    win_h: np.ndarray,
    canvases: np.ndarray,
    nthreads: int = 0,
):
    """Threaded window-decode: the source window (src_x, src_y, win_w,
    win_h) of bufs[i] lands at (dst_x, dst_y) of canvases[i]; all other
    canvas bytes are zeroed in C++. Returns a status int32 array —
    status[i] != 0 means image i failed and its slot is zeros (the caller
    decodes that one via its Python fallback). Returns None when the
    native library is unavailable."""
    lib = load_loader()
    if lib is None:
        return None
    n = len(bufs)
    assert canvases.dtype == np.uint8 and canvases.flags["C_CONTIGUOUS"]
    assert canvases.shape[0] == n and canvases.shape[3] == 3
    assert canvases.shape[1] == canvases.shape[2]
    buf_ptrs = (ctypes.c_char_p * n)(*bufs)
    sizes = (ctypes.c_longlong * n)(*[len(b) for b in bufs])

    def _iptr(a):
        a = np.ascontiguousarray(a, np.int32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    keep = [_iptr(a) for a in (src_x, src_y, dst_x, dst_y, win_w, win_h)]
    status = np.zeros((n,), np.int32)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    lib.dan_decode_batch(
        buf_ptrs,
        sizes,
        n,
        *[p for _, p in keep],
        int(canvases.shape[1]),
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(nthreads),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return status


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
