"""Multi-scale + flip inference drivers.

Behavioral reference: pyscripts/inference/inference_msc.py:114-245 and
spml/utils/general/others.py:10-47 (create_image_pyramid) in twke18/SPML:
per (scale, flip): resize image, predict class probabilities (one-hot
top-20 mean for KNN; softmax for the classifier), bilinear-resize probs
back to the base resolution, un-flip, then mean over the pyramid and
argmax.
"""

from __future__ import annotations

import numpy as np

from spml_tpu.data import transforms


def image_pyramid(image: np.ndarray, scales, is_flip: bool):
    """Yields (scaled_image, scale, flipped) pairs; image is [H, W, 3]."""
    flips = [False, True] if is_flip else [False]
    for scale in scales:
        h, w = image.shape[:2]
        nh, nw = int(h * scale), int(w * scale)
        scaled = transforms._resize_image(image, nh, nw) \
            if scale != 1 else image
        for f in flips:
            yield (scaled[:, ::-1].copy() if f else scaled), scale, f


def msc_predict_probs(predict_probs_fn, image: np.ndarray, scales,
                      is_flip: bool = True) -> np.ndarray:
    """Average class probabilities over the (scale x flip) pyramid.

    predict_probs_fn(image) -> [h, w, C] probabilities at the given
    image's resolution.
    """
    h, w = image.shape[:2]
    acc = None
    n = 0
    for img, _, flipped in image_pyramid(image, scales, is_flip):
        probs = predict_probs_fn(img)
        probs = transforms._resize_image(probs, h, w)
        if flipped:
            probs = probs[:, ::-1]
        acc = probs if acc is None else acc + probs
        n += 1
    return acc / n
