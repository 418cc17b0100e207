"""Softmax-classifier inference (stage-2 models).

Behavioral reference: pyscripts/inference/inference_softmax.py:115-170 in
twke18/SPML — sliding-window over the padded image, classifier logits
over L2-normalized embeddings upsampled to the crop size, logits SUMMED
over overlapping patches, argmax (no count normalization: argmax is
invariant to the positive patch counts only when counts are uniform;
the reference sums raw logits and so do we).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.data import transforms
from spml_tpu.inference.engine import patch_ends
from spml_tpu.ops import common


class SoftmaxInferenceEngine:
    def __init__(self, config, emb_model, emb_vars, cls_model, cls_vars):
        self.config = config
        self.emb_model = emb_model
        self.cls_model = cls_model
        self.emb_vars = emb_vars
        self.cls_vars = cls_vars
        self.crop = tuple(config.test.crop_size)
        self.stride = tuple(config.test.stride)
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, image):
        emb, _ = self.emb_model.apply(self.emb_vars, image, train=False,
                                      resize_as_input=True)
        emb = common.normalize_embedding(emb.astype(jnp.float32))
        logits = self.cls_model.apply(self.cls_vars, emb, train=False)
        return logits

    def predict_logits(self, image: np.ndarray,
                       device_out: bool = False):
        """[H, W, C] summed sliding-window logits at image resolution.
        Accumulation stays on device; only the final map comes down
        (or stays up with device_out=True, for MSC's on-device mean)."""
        import jax.lax as lax
        crop_h, crop_w = self.crop
        img = transforms.resize_with_pad(image, self.crop, 0.0)
        pad_h, pad_w = img.shape[:2]
        ends_h = patch_ends(pad_h, crop_h, self.stride[0])
        ends_w = patch_ends(pad_w, crop_w, self.stride[1])
        c = self.config.dataset.num_classes
        img_dev = jnp.asarray(img)
        total = jnp.zeros((pad_h, pad_w, c), jnp.float32)
        for eh in ends_h:
            for ew in ends_w:
                sh, sw = int(eh - crop_h), int(ew - crop_w)
                patch = jax.lax.dynamic_slice(
                    img_dev, (sh, sw, 0), (crop_h, crop_w, 3))
                logits = self._forward(patch[None])[0]
                cur = lax.dynamic_slice(total, (sh, sw, 0), logits.shape)
                total = lax.dynamic_update_slice(total, cur + logits,
                                                 (sh, sw, 0))
        h, w = image.shape[:2]
        if device_out:
            return total[:h, :w]
        return np.asarray(total[:h, :w])

    def predict_probs(self, image: np.ndarray,
                      device_out: bool = False):
        logits = self.predict_logits(image, device_out=True)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs if device_out else np.asarray(probs)
