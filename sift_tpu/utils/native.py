"""ctypes bindings for the native runtime (csrc/sift_tpu_native.cpp).

Provides the C++ threaded image loader and drawing rasterizers with
automatic build-on-first-use (``make -C csrc``) and a clean ``None`` handle
when the toolchain is unavailable so pure-Python fallbacks take over.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = pathlib.Path(__file__).resolve().parents[1]
    so = root / "_native.so"
    if not so.exists():
        csrc = root.parent / "csrc"
        try:
            subprocess.run(
                ["make", "-C", str(csrc)], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    lib.sift_decode_image.restype = ctypes.c_int
    lib.sift_decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sift_free.argtypes = [ctypes.c_void_p]
    lib.sift_loader_create.restype = ctypes.c_void_p
    lib.sift_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
    ]
    lib.sift_loader_next.restype = ctypes.c_int
    lib.sift_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sift_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.sift_draw_keypoints.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_double,
    ]
    lib.sift_draw_match_lines.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sift_draw_line.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.sift_draw_circle.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sift_pow2.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _take_buffer(lib, data_p, w, h, c) -> np.ndarray:
    n = w * h * c
    arr = np.ctypeslib.as_array(data_p, shape=(n,)).astype(np.float32).reshape(
        h, w, c
    )
    lib.sift_free(data_p)
    return arr


def decode_image(path: str) -> np.ndarray | None:
    """Native decode to (H, W, C) float32 in [0, 255]; None on failure."""
    lib = _lib()
    if lib is None:
        return None
    data_p = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    ok = lib.sift_decode_image(
        path.encode(), ctypes.byref(data_p), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(c),
    )
    if not ok:
        return None
    return _take_buffer(lib, data_p, w.value, h.value, c.value)


class ImageLoader:
    """Threaded prefetching image loader (C++ decode pool).

    Iterates (H, W, C) float32 arrays in submission order while worker
    threads decode ahead — keeps the device fed without host decode stalls.
    """

    def __init__(self, paths: list[str], n_threads: int = 4):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._n = len(paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.sift_loader_create(arr, len(paths), n_threads)
        self._emitted = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._emitted >= self._n:
            raise StopIteration
        data_p = ctypes.POINTER(ctypes.c_float)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        ok = self._lib.sift_loader_next(
            self._handle, ctypes.byref(data_p), ctypes.byref(w),
            ctypes.byref(h), ctypes.byref(c),
        )
        self._emitted += 1
        if not ok:
            raise IOError("decode failed")
        return _take_buffer(self._lib, data_p, w.value, h.value, c.value)

    def close(self):
        if self._handle:
            self._lib.sift_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


def pow2_glibc(x: np.ndarray) -> np.ndarray | None:
    """Elementwise glibc pow(2, x) on float64; None if the lib is missing.

    Bit-identical to Python's math.pow(2, .) per element (both call libm),
    unlike np.power whose SIMD path rounds differently on ~5% of inputs.
    """
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    out = np.empty_like(x)
    lib.sift_pow2(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.size,
    )
    return out.reshape(x.shape)


def draw_keypoints_native(img: np.ndarray, kps: dict, scales_count: float):
    """In-place native keypoint overlay on an (H, W, 3) float32 array."""
    lib = _lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    xs = np.ascontiguousarray(kps["x"], np.float64)
    ys = np.ascontiguousarray(kps["y"], np.float64)
    layers = np.ascontiguousarray(kps["layer"], np.int32)
    poris = np.ascontiguousarray(kps["pori"], np.float64)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    lib.sift_draw_keypoints(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h, c,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        layers.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        poris.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(xs), float(scales_count),
    )
    return img


def draw_match_lines_native(img: np.ndarray, p1: np.ndarray, p2: np.ndarray,
                            x_offset: int, color: int = 0xFFFFFF):
    lib = _lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    x1 = np.ascontiguousarray(p1[:, 0], np.float64)
    y1 = np.ascontiguousarray(p1[:, 1], np.float64)
    x2 = np.ascontiguousarray(p2[:, 0], np.float64)
    y2 = np.ascontiguousarray(p2[:, 1], np.float64)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    lib.sift_draw_match_lines(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h, c,
        x1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x1), x_offset, color,
    )
    return img
