"""ctypes wrapper over native/dataio — the fused C++ train-item path.

One call decodes (libjpeg/libpng, the same codecs PIL wraps), mirrors,
resizes (PIL-exact bilinear for the image, floor-index nearest for
labels), pads, crops and normalizes a training item. Randomness stays
in Python: datasets.ListDataset draws mirror/scale/crop from its
np.random.Generator stream and passes the resolved parameters, so the
native path yields the same item as the Python path for a given
(seed, index) — decode/mirror/crop/normalize bitwise, resize within
float tolerance (tests/test_native_io.py).

The wrapper degrades gracefully: if the library cannot be built or a
file cannot be decoded, callers fall back to the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "dataio")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdataio.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False

_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def load_library():
    """Returns the ctypes lib, or None if unavailable (never raises)."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dataio_image_size.restype = ctypes.c_int
            lib.dataio_image_size.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.dataio_train_item.restype = ctypes.c_int
            lib.dataio_train_item.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int, ctypes.c_double,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                _F32P, _F32P, _F32P, _I32P, _I32P, _U8P]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib_failed = True
        return _lib


def image_size(path: str) -> tuple[int, int] | None:
    """JPEG header-only (h, w) probe; None when not decodable here."""
    lib = load_library()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.dataio_image_size(path.encode(), ctypes.byref(h),
                             ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def train_item(image_path: str, sem_path: str, inst_path: str | None,
               mirror: bool, ratio: float, crop_hw: tuple[int, int],
               start_hw: tuple[int, int], img_mean, img_std,
               want_tags: bool):
    """Full fused item; returns (image f32 [H,W,3], sem i32, inst i32
    or None, tags u8[256] or None), or None on any failure (caller
    falls back to Python)."""
    lib = load_library()
    if lib is None:
        return None
    ch, cw = crop_hw
    image = np.empty((ch, cw, 3), np.float32)
    sem = np.empty((ch, cw), np.int32)
    inst = np.empty((ch, cw), np.int32) if inst_path else None
    tags = np.zeros((256,), np.uint8) if want_tags else None
    mean = np.ascontiguousarray(img_mean, np.float32)
    std = np.ascontiguousarray(img_std, np.float32)
    rc = lib.dataio_train_item(
        image_path.encode(), sem_path.encode(),
        inst_path.encode() if inst_path else None,
        1 if mirror else 0, float(ratio), ch, cw,
        int(start_hw[0]), int(start_hw[1]),
        mean.ctypes.data_as(_F32P), std.ctypes.data_as(_F32P),
        image.ctypes.data_as(_F32P), sem.ctypes.data_as(_I32P),
        inst.ctypes.data_as(_I32P) if inst is not None else None,
        tags.ctypes.data_as(_U8P) if tags is not None else None)
    if rc != 0:
        return None
    return image, sem, inst, tags
