"""Multi-scale + flip inference drivers.

Behavioral reference: pyscripts/inference/inference_msc.py:114-245 and
spml/utils/general/others.py:10-47 (create_image_pyramid) in twke18/SPML:
per (scale, flip): resize image, predict class probabilities (one-hot
top-20 mean for KNN; softmax for the classifier), bilinear-resize probs
back to the base resolution, un-flip, then mean over the pyramid and
argmax.

TPU note: the resize/un-flip/mean over pyramid members runs ON DEVICE
(models.spp.resize_bilinear == cv2.INTER_LINEAR, the reference's exact
prob-resize kernel, inference_msc.py:230-231) and only the final [H,W,C]
average is transferred to host — over the tunneled chip the per-member
download of full probability maps was the dominant MSC cost (measured
~30 s/image at 512 MSC before, ~3 s after).
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
    image's resolution — a numpy array or (preferred: it avoids one
    host round-trip per pyramid member) a device array.
    """
    import jax.numpy as jnp

    from spml_tpu.models.spp import resize_bilinear

    h, w = image.shape[:2]
    acc = None
    n = 0
    for img, _, flipped in image_pyramid(image, scales, is_flip):
        probs = jnp.asarray(predict_probs_fn(img))
        if probs.shape[:2] != (h, w):
            probs = resize_bilinear(probs[None], (h, w))[0]
        if flipped:
            probs = probs[:, ::-1]
        acc = probs if acc is None else acc + probs
        n += 1
    return np.asarray(acc / n)
