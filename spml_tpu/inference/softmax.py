"""Softmax-classifier inference (stage-2 models).

Behavioral reference: pyscripts/inference/inference_softmax.py:115-170 in
twke18/SPML — sliding-window over the padded image, classifier logits
over L2-normalized embeddings upsampled to the crop size, logits SUMMED
over overlapping patches, argmax (no count normalization: the reference
sums raw logits and so do we; softmax after the sum — slicing commutes
with the per-pixel softmax so bucket padding changes nothing).

TPU design mirrors the KNN engine (engine.py): padded shapes are
BUCKETED to crop + k*stride; the whole per-image (or per-pyramid-member)
pipeline — pad, sliding-window patches, batched embed+classifier
forward, logit sum, softmax, and for MSC members the scale-resize +
flip from the device-resident base — is ONE jitted program per bucket,
so an MSC image costs one ~3 MB base upload and one probability
download over the tunneled chip instead of ~22 MB of member transfers
(PERF.md "MSC inference latency").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.data import transforms
from spml_tpu.inference import engine as engine_lib
from spml_tpu.inference.engine import (bucket_dim, device_member_resize,
                                       patch_ends)
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
        self.pad_buckets = bool(
            getattr(config.tpu, "pad_to_stride_buckets", True))
        self._img_dtype = (jnp.bfloat16
                           if config.tpu.compute_dtype == "bfloat16"
                           else jnp.float32)
        self._forward = jax.jit(self._forward_impl)
        self._fused_probs = jax.jit(self._fused_probs_impl)
        self._fused_member = jax.jit(
            self._fused_member_impl, static_argnames=("member_bucket",))
        self._fused_member_pair = jax.jit(
            self._fused_member_pair_impl,
            static_argnames=("member_bucket",))
        self._member_pair_acc = jax.jit(
            self._member_pair_acc_impl,
            static_argnames=("member_bucket",), donate_argnums=(0,))

    def bucket_shape(self, h: int, w: int) -> tuple[int, int]:
        if not self.pad_buckets:
            return max(h, self.crop[0]), max(w, self.crop[1])
        return (bucket_dim(h, self.crop[0], self.stride[0]),
                bucket_dim(w, self.crop[1], self.stride[1]))

    def upload_image(self, image_np: np.ndarray) -> jnp.ndarray:
        if self._img_dtype == jnp.bfloat16:
            import ml_dtypes
            return jnp.asarray(image_np.astype(ml_dtypes.bfloat16))
        return jnp.asarray(image_np.astype(np.float32, copy=False))

    def _forward_impl(self, image):
        emb, _ = self.emb_model.apply(self.emb_vars, image, train=False,
                                      resize_as_input=True)
        emb = common.normalize_embedding(emb.astype(jnp.float32))
        logits = self.cls_model.apply(self.cls_vars, emb, train=False)
        return logits

    def _fused_probs_impl(self, img):
        """[Hb, Wb, C] per-pixel softmax of patch-summed logits, one
        program per bucket: static patch grid, all patches as one
        batched forward."""
        crop_h, crop_w = self.crop
        pad_h, pad_w = img.shape[:2]
        ends_h = [int(e) for e in patch_ends(pad_h, crop_h,
                                             self.stride[0])]
        ends_w = [int(e) for e in patch_ends(pad_w, crop_w,
                                             self.stride[1])]
        windows = [(eh - crop_h, ew - crop_w)
                   for eh in ends_h for ew in ends_w]
        patches = jnp.stack([img[sh:sh + crop_h, sw:sw + crop_w]
                             for sh, sw in windows])
        logits = self._forward_impl(patches)  # [P, ch, cw, C]
        total = jnp.zeros((pad_h, pad_w, logits.shape[-1]), jnp.float32)
        for k, (sh, sw) in enumerate(windows):
            total = total.at[sh:sh + crop_h, sw:sw + crop_w].add(
                logits[k])
        return jax.nn.softmax(total, axis=-1)

    def _fused_member_impl(self, base_img, base_hw, member_hw, flip,
                           member_bucket):
        member = device_member_resize(base_img, base_hw, member_hw, flip,
                                      member_bucket)
        return self._fused_probs_impl(member)

    def _fused_member_pair_impl(self, base_img, base_hw, member_hw,
                                member_bucket):
        """Both flips of one MSC scale in ONE program (all 2 x
        n_windows patches share a single embed+classifier forward);
        mirrors engine._fused_member_pair_impl. Returns [2, Hb, Wb, C]
        probs, index 1 still in flipped orientation."""
        m0 = device_member_resize(base_img, base_hw, member_hw,
                                  jnp.asarray(0, jnp.int32),
                                  member_bucket)
        m1 = device_member_resize(base_img, base_hw, member_hw,
                                  jnp.asarray(1, jnp.int32),
                                  member_bucket)
        return jax.vmap(self._fused_probs_impl)(jnp.stack([m0, m1]))

    def predict_member_probs(self, base_dev, base_hw, member_hw: tuple,
                             flip: bool):
        """One MSC member's bucket-shaped [Hb, Wb, C] device probs from
        the device-resident base image (msc.msc_predict_probs_device)."""
        member_bucket = self.bucket_shape(*member_hw)
        return self._fused_member(
            base_dev, base_hw, jnp.asarray(member_hw, jnp.int32),
            jnp.asarray(1 if flip else 0, jnp.int32),
            member_bucket=member_bucket)

    def predict_member_pair_probs(self, base_dev, base_hw,
                                  member_hw: tuple):
        """Both flips of one MSC scale as one fused program
        (msc._msc_accumulate_device's pair path)."""
        member_bucket = self.bucket_shape(*member_hw)
        return self._fused_member_pair(
            base_dev, base_hw, jnp.asarray(member_hw, jnp.int32),
            member_bucket=member_bucket)

    def _member_pair_acc_impl(self, acc, base_img, base_hw, member_hw,
                              out_hw, member_bucket):
        """Pair + both accumulates in one program, acc donated
        (mirrors engine._member_pair_acc_impl)."""
        from spml_tpu.inference import msc as msc_lib
        pair = self._fused_member_pair_impl(
            base_img, base_hw, member_hw, member_bucket=member_bucket)
        acc = msc_lib.resize_accumulate_body(acc, pair[0], member_hw,
                                             out_hw, flip=False)
        return msc_lib.resize_accumulate_body(acc, pair[1], member_hw,
                                              out_hw, flip=True)

    def accumulate_member_pair(self, acc, base_dev, base_hw,
                               member_hw: tuple, out_hw):
        member_bucket = self.bucket_shape(*member_hw)
        return self._member_pair_acc(
            acc, base_dev, base_hw, jnp.asarray(member_hw, jnp.int32),
            out_hw, member_bucket=member_bucket)

    def warmup(self, max_hw: int | None = None,
               device_pyramid: bool = False) -> list:
        """AOT-compile the bucket programs (see engine.warmup)."""
        cfg = self.config
        if max_hw is None:
            max_hw = cfg.test.image_size or max(self.crop)
        hs = sorted({bucket_dim(s, self.crop[0], self.stride[0])
                     for s in range(1, max_hw + 1)})
        ws = sorted({bucket_dim(s, self.crop[1], self.stride[1])
                     for s in range(1, max_hw + 1)})
        base_max = cfg.test.image_size or max(self.crop)
        bhs = sorted({bucket_dim(s, self.crop[0], self.stride[0])
                      for s in range(1, base_max + 1)})
        bws = sorted({bucket_dim(s, self.crop[1], self.stride[1])
                      for s in range(1, base_max + 1)})
        warmed = []
        thunks = []
        for ph in hs:
            for pw in ws:
                if device_pyramid:
                    c = cfg.dataset.num_classes
                    for bh in bhs:
                        for bw in bws:
                            thunks.append(
                                lambda bh=bh, bw=bw, ph=ph, pw=pw, c=c:
                                self._member_pair_acc(
                                    jnp.zeros((bh, bw, c), jnp.float32),
                                    jnp.zeros((bh, bw, 3),
                                              self._img_dtype),
                                    jnp.asarray([bh, bw], jnp.int32),
                                    jnp.asarray([ph, pw], jnp.int32),
                                    jnp.asarray([bh, bw], jnp.int32),
                                    member_bucket=(ph, pw)))
                else:
                    thunks.append(lambda ph=ph, pw=pw:
                                  self._fused_probs(jnp.zeros(
                                      (ph, pw, 3), self._img_dtype)))
                warmed.append((ph, pw))
        if device_pyramid:
            from spml_tpu.inference import msc as msc_lib
            c = cfg.dataset.num_classes
            hw = jnp.asarray([self.crop[0], self.crop[1]], jnp.int32)
            for pb in warmed:
                probs = jnp.zeros(pb + (c,), jnp.float32)
                for bh in bhs:
                    for bw in bws:
                        acc = jnp.zeros((bh, bw, c), jnp.float32)
                        for flip in (False, True):
                            thunks.append(
                                lambda acc=acc, probs=probs, hw=hw,
                                bh=bh, bw=bw, flip=flip:
                                msc_lib._resize_accumulate(
                                    acc, probs, hw, hw,
                                    out_bucket=(bh, bw), flip=flip))
        engine_lib.run_warmup_thunks(thunks)
        return warmed

    def predict_logits(self, image: np.ndarray,
                       device_out: bool = False):
        """[H, W, C] summed sliding-window logits at image resolution
        (the original eager-stitched path; kept for parity tests —
        predict_probs(fused=False) routes through it)."""
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
                      device_out: bool = False,
                      bucket_out: bool = False,
                      fused: bool = True):
        if fused:
            h, w = image.shape[:2]
            pad = self.bucket_shape(h, w)
            img = transforms.resize_with_pad(image, pad, 0.0)
            probs = self._fused_probs(self.upload_image(img))
        else:
            logits = self.predict_logits(image, device_out=True)
            probs = jax.nn.softmax(logits, axis=-1)
            h, w = image.shape[:2]
            if bucket_out or device_out:
                return probs
            return np.asarray(probs)
        if bucket_out:
            return probs
        if device_out:
            return probs[:h, :w]
        return np.asarray(probs)[:h, :w]
