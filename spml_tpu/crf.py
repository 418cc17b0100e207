"""Host-side dense CRF post-processing (ctypes over our C++ library).

Behavioral reference: spml/models/crf.py:14-41 in twke18/SPML — a
pydensecrf DenseCRF2D with Gaussian pairwise (pos_xy_std, pos_w) +
bilateral pairwise (bi_xy_std, bi_rgb_std, bi_w) over a softmax unary,
`iter_max` mean-field iterations. pydensecrf is not available here, so
native/densecrf/ implements the permutohedral-lattice mean field in C++
(built on first use with g++); the API below mirrors the reference
wrapper exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "densecrf")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdensecrf.so")
_lock = threading.Lock()
_lib = None


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.crf2d_new.restype = ctypes.c_void_p
        lib.crf2d_new.argtypes = [ctypes.c_int] * 3
        lib.crf2d_free.argtypes = [ctypes.c_void_p]
        lib.crf2d_set_unary_from_probs.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.crf2d_add_pairwise_gaussian.argtypes = [
            ctypes.c_void_p, ctypes.c_float, ctypes.c_float, ctypes.c_float]
        lib.crf2d_add_pairwise_bilateral.argtypes = [
            ctypes.c_void_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_float]
        lib.crf2d_inference.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


class DenseCRF:
    """Same constructor surface as the reference wrapper (crf.py:14)."""

    def __init__(self, iter_max=10, pos_w=3, pos_xy_std=1, bi_w=4,
                 bi_xy_std=67, bi_rgb_std=3):
        self.iter_max = int(iter_max)
        self.pos_w = float(pos_w)
        self.pos_xy_std = float(pos_xy_std)
        self.bi_w = float(bi_w)
        self.bi_xy_std = float(bi_xy_std)
        self.bi_rgb_std = float(bi_rgb_std)

    def __call__(self, image: np.ndarray, probmap: np.ndarray) -> np.ndarray:
        """image: [H, W, 3] uint8; probmap: [C, H, W] float probabilities.
        Returns refined [C, H, W] marginals."""
        lib = _load_library()
        c, h, w = probmap.shape
        assert image.shape[:2] == (h, w), (image.shape, probmap.shape)
        probs = np.ascontiguousarray(probmap, np.float32)
        rgb = np.ascontiguousarray(image, np.uint8)
        out = np.empty((c, h, w), np.float32)

        handle = lib.crf2d_new(w, h, c)
        try:
            lib.crf2d_set_unary_from_probs(
                handle, probs.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)))
            lib.crf2d_add_pairwise_gaussian(
                handle, self.pos_xy_std, self.pos_xy_std, self.pos_w)
            lib.crf2d_add_pairwise_bilateral(
                handle, self.bi_xy_std, self.bi_xy_std, self.bi_rgb_std,
                self.bi_rgb_std, self.bi_rgb_std,
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                self.bi_w)
            lib.crf2d_inference(
                handle, self.iter_max,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        finally:
            lib.crf2d_free(handle)
        return out
