"""Per-stage timing of the native DenseCRF (ctypes stage boundaries).

Stages: add_gaussian / add_bilateral (lattice Init + BuildNorm) and
inference (iter_max mean-field iterations: 2 filters + exp-normalize
each). Run after any permutohedral.cc change to see where the
512x512x21 budget goes.
"""
import ctypes
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

from spml_tpu.crf import _load_library  # noqa: E402


def main():
    h = w = 512
    c = 21
    rng = np.random.default_rng(0)
    # Smooth-ish image: block noise upsampled (realistic lattice occupancy).
    small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
    rgb = np.ascontiguousarray(np.kron(
        small, np.ones((8, 8, 1), np.uint8)))
    logits = rng.normal(0, 2, (c, h, w)).astype(np.float32)
    probs = np.exp(logits - logits.max(0))
    probs /= probs.sum(0)
    probs = np.ascontiguousarray(probs, np.float32)
    out = np.empty((c, h, w), np.float32)

    lib = _load_library()
    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_ubyte)

    for trial in range(3):
        t = {}
        t0 = time.perf_counter()
        handle = lib.crf2d_new(w, h, c)
        lib.crf2d_set_unary_from_probs(handle, probs.ctypes.data_as(fp))
        t["unary"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        lib.crf2d_add_pairwise_gaussian(handle, 1.0, 1.0, 3.0)
        t["gaussian_init"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        lib.crf2d_add_pairwise_bilateral(
            handle, 67.0, 67.0, 3.0, 3.0, 3.0,
            rgb.ctypes.data_as(up), 4.0)
        t["bilateral_init"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        lib.crf2d_inference(handle, 10, out.ctypes.data_as(fp))
        t["inference_10it"] = time.perf_counter() - t0
        lib.crf2d_free(handle)

        total = sum(t.values())
        print(f"trial {trial}: " + "  ".join(
            f"{k}={v * 1e3:.0f}ms" for k, v in t.items()) +
            f"  total={total * 1e3:.0f}ms")
    print("argmax checksum:", int(out.argmax(0).sum()))


if __name__ == "__main__":
    main()
