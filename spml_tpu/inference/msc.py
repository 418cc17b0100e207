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

import functools

import jax
import jax.numpy as jnp
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


def bilinear_resize_weights(n_out_b, n_in_b, valid_out, valid_in,
                            reverse):
    """[n_out_b, n_in_b] bilinear sampling weights with half-pixel
    centers and edge clamp == cv2.INTER_LINEAR (the reference's image
    and probability resize kernel). valid_out/valid_in may be traced
    scalars (bucket-static programs); reverse (python bool or traced
    flag) reflects the source coordinate — resampling the horizontally
    flipped input without materializing it."""
    i = jnp.arange(n_out_b, dtype=jnp.float32)
    src = jnp.clip((i + 0.5) * (valid_in / valid_out) - 0.5,
                   0.0, valid_in - 1.0)
    src = jnp.where(reverse, (valid_in - 1.0) - src, src)
    y = jnp.arange(n_in_b, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - y[None, :]))


def resize_accumulate_body(acc, probs, in_hw, out_hw, flip: bool):
    """acc += bilinear_resize(probs[:in_h, :in_w], (out_h, out_w)),
    un-flipping first, ALL at static bucket shapes — the in-graph body
    shared by the standalone jitted _resize_accumulate and the fused
    member-pair programs (engine.accumulate_member_pair).

    probs: [Hb', Wb', C] with the valid member prediction in
    [:in_h, :in_w]; acc: [Hb, Wb, C] with the base image occupying
    [:out_h, :out_w]. in_hw / out_hw are TRACED scalars, so one compiled
    program serves every image that maps to the same (in-bucket,
    out-bucket, flip) triple — this is what caps the MSC compile set at
    the bucket grid instead of one program per exact image shape.

    The resize is expressed as two dense matmuls with on-the-fly
    bilinear weight matrices (half-pixel centers, edge clamp, no
    antialias) == cv2.INTER_LINEAR == the reference's prob resize
    (inference_msc.py:230-231). Rows/cols beyond the valid output
    region accumulate garbage; callers slice [:out_h, :out_w] at the
    end (every member shares the same base region).
    """
    in_h = in_hw[0].astype(jnp.float32)
    in_w = in_hw[1].astype(jnp.float32)
    out_h = out_hw[0].astype(jnp.float32)
    out_w = out_hw[1].astype(jnp.float32)

    wr = bilinear_resize_weights(acc.shape[0], probs.shape[0], out_h,
                                 in_h, False)
    # flip: member was predicted on the flipped image
    wc = bilinear_resize_weights(acc.shape[1], probs.shape[1], out_w,
                                 in_w, flip)
    tmp = jnp.einsum("oi,iwc->owc", wr, probs,
                     preferred_element_type=jnp.float32)
    res = jnp.einsum("pw,owc->opc", wc, tmp,
                     preferred_element_type=jnp.float32)
    return acc + res


@functools.partial(jax.jit,
                   static_argnames=("out_bucket", "flip"))
def _resize_accumulate(acc, probs, in_hw, out_hw, out_bucket, flip):
    """Jitted resize_accumulate_body (out_bucket is implied by acc's
    static shape; kept in the signature for call-site clarity)."""
    del out_bucket
    return resize_accumulate_body(acc, probs, in_hw, out_hw, flip)


def _msc_accumulate_device(engine, image: np.ndarray, member_args,
                           scales, is_flip: bool):
    """Shared device pyramid loop: upload the base image ONCE, run each
    (scale, flip) member's fused program, resize/un-flip/accumulate the
    probs at the base bucket, all on device. Returns (acc, n, base_b)
    with acc a DEVICE [Hb, Wb, C] float32 sum over n members, valid in
    [:h, :w]."""
    h, w = image.shape[:2]
    base_b = engine.bucket_shape(h, w)
    base = transforms.resize_with_pad(image, base_b, 0.0)
    base_dev = (engine.upload_image(base)
                if hasattr(engine, "upload_image") else jnp.asarray(base))
    base_hw = jnp.asarray([h, w], jnp.int32)

    flips = [False, True] if is_flip else [False]
    use_pair = is_flip and hasattr(engine, "accumulate_member_pair")
    acc = None
    n = 0
    out_hw = jnp.asarray([h, w], jnp.int32)
    for scale in scales:
        member_hw = (int(h * scale), int(w * scale))
        in_hw = jnp.asarray(member_hw, jnp.int32)
        if use_pair:
            # both flips of this scale + their resize/un-flip/
            # accumulates in ONE fused program with a donated
            # accumulator (engine.accumulate_member_pair): one dispatch
            # per scale — each dispatch is a tunnel round-trip here
            if acc is None:
                C = engine.config.dataset.num_classes
                acc = jnp.zeros(base_b + (C,), jnp.float32)
            acc = engine.accumulate_member_pair(
                acc, base_dev, base_hw, member_hw, out_hw, *member_args)
            n += 2
            continue
        for f in flips:
            probs = engine.predict_member_probs(
                base_dev, base_hw, member_hw, f, *member_args)
            if acc is None:
                acc = jnp.zeros(base_b + (probs.shape[-1],), jnp.float32)
            acc = _resize_accumulate(acc, probs, in_hw, out_hw,
                                     out_bucket=base_b, flip=bool(f))
            n += 1
    return acc, n, base_b


def msc_predict_probs_device(engine, image: np.ndarray, member_args,
                             scales, is_flip: bool = True,
                             transfer_dtype=np.float16) -> np.ndarray:
    """MSC average with the ENTIRE pyramid on device: the base image is
    uploaded ONCE and each member's scale-resize + flip happens inside
    the member's fused program (engine.predict_member_probs), so the
    only transfers per image are one ~3 MB base upload and one
    probability download. Over the tunneled chip (measured ~20-30 MB/s)
    the per-member host resize + upload of msc_predict_probs_bucketed
    (~22 MB/image at 512) WAS the steady-state latency.

    Works with any engine exposing bucket_shape(h, w) and
    predict_member_probs(base_dev, base_hw, member_hw, flip,
    *member_args) — the KNN InferenceEngine (member_args = the memory
    bank triple) and the SoftmaxInferenceEngine (member_args = ()).

    transfer_dtype: dtype of the downloaded accumulated probs. The
    top-20 one-hot means are quantized at 1/20 per member, so float16
    (resolution ~5e-4) is lossless in practice and halves the download;
    pass np.float32 for bit-exact parity runs.
    """
    return msc_predict_probs_device_async(
        engine, image, member_args, scales, is_flip, transfer_dtype)()


def msc_predict_probs_device_async(engine, image: np.ndarray,
                                   member_args, scales,
                                   is_flip: bool = True,
                                   transfer_dtype=np.float16):
    """Non-blocking msc_predict_probs_device: dispatches the pyramid,
    casts the accumulator to transfer_dtype on device, STARTS the
    device->host copy, and returns a zero-arg resolve() that completes
    the transfer and returns the [h, w, C] float32 mean probs
    (identical to the sync function's result).

    The fp16 prob download (~11 MB at 512/21c) is the dominant
    steady-state cost of the CRF MSC paths over the ~20-30 MB/s tunnel;
    calling resolve() on the CRF sink pool (runner._AsyncSink) moves
    that wait off the main loop, overlapping image i's download with
    image i+1's host prep and device dispatch. The reference downloads
    and CRFs inline between forward passes (inference_crf_msc.py main
    loop), so ordering/semantics are unchanged — outputs are per-image
    files."""
    h, w = image.shape[:2]
    acc, n, _ = _msc_accumulate_device(engine, image, member_args,
                                       scales, is_flip)
    small = acc.astype(transfer_dtype)
    try:
        small.copy_to_host_async()
    except Exception:  # backends without async D2H: resolve() blocks
        pass

    def resolve():
        return np.asarray(small)[:h, :w].astype(np.float32) / n

    return resolve


@functools.partial(jax.jit, static_argnames=("final_bucket",))
def _resize_argmax(acc, in_hw, final_hw, final_bucket):
    """argmax(bilinear_resize(acc[:in_h, :in_w], (final_h, final_w)))
    as uint8 at a static final bucket. Same bilinear kernel as
    _resize_accumulate (== cv2.INTER_LINEAR == the reference's prob
    resize, inference_msc.py:230-231); the reference argmaxes AFTER
    averaging+resizing (inference_msc.py:238-242), which this preserves
    — a positive divisor (the member count) never changes an argmax,
    so the un-normalized sum is argmaxed directly."""
    in_h = in_hw[0].astype(jnp.float32)
    in_w = in_hw[1].astype(jnp.float32)
    f_h = final_hw[0].astype(jnp.float32)
    f_w = final_hw[1].astype(jnp.float32)
    wr = bilinear_resize_weights(final_bucket[0], acc.shape[0], f_h,
                                 in_h, False)
    wc = bilinear_resize_weights(final_bucket[1], acc.shape[1], f_w,
                                 in_w, False)
    tmp = jnp.einsum("oi,iwc->owc", wr, acc,
                     preferred_element_type=jnp.float32)
    res = jnp.einsum("pw,owc->opc", wc, tmp,
                     preferred_element_type=jnp.float32)
    return jnp.argmax(res, axis=-1).astype(jnp.uint8)


def msc_predict_labels_device(engine, image: np.ndarray, member_args,
                              scales, is_flip: bool = True,
                              final_hw=None) -> np.ndarray:
    """MSC prediction finished ON DEVICE: accumulate the pyramid probs
    at the base bucket, bilinear-resize to final_hw (default: the
    image's own size) and argmax INSIDE one last bucketed program, and
    download only the uint8 label map — ~1 byte/pixel instead of the
    C-channel float16 probs (42x less at 21 classes; over the ~20-30
    MB/s tunnel the prob download was the dominant steady-state MSC
    cost). For non-CRF MSC paths this is observably identical to
    downloading probs, host-resizing, and argmaxing, because the
    reference's own order is average -> resize -> argmax
    (inference_msc.py:228-242) and a positive divisor never changes an
    argmax. CRF paths need the real probs; use msc_predict_probs_device
    there."""
    h, w = image.shape[:2]
    fh, fw = final_hw if final_hw is not None else (h, w)
    acc, _, _ = _msc_accumulate_device(engine, image, member_args,
                                       scales, is_flip)
    final_b = engine.bucket_shape(fh, fw)
    pred = _resize_argmax(acc, jnp.asarray([h, w], jnp.int32),
                          jnp.asarray([fh, fw], jnp.int32),
                          final_bucket=final_b)
    return np.asarray(pred)[:fh, :fw]


def msc_predict_probs_bucketed(predict_bucket_fn, image: np.ndarray,
                               scales, bucket_shape,
                               is_flip: bool = True) -> np.ndarray:
    """MSC average with the ENTIRE post-prediction pipeline at static
    bucket shapes: one compiled resize/accumulate program per
    (member-bucket, base-bucket, flip) triple instead of one per exact
    image shape (compiles over the tunneled chip cost ~seconds EACH, so
    exact-shape programs made the first pass over a new aspect ratio
    ~20x slower than steady state).

    predict_bucket_fn(img) -> [Hb', Wb', C] device probs, valid in
    [:img_h, :img_w] (InferenceEngine.predict_topk_probs with
    bucket_out=True). bucket_shape(h, w) -> the engine's pad bucket.
    """
    import jax.numpy as jnp

    h, w = image.shape[:2]
    out_b = bucket_shape(h, w)
    acc = None
    n = 0
    out_hw = jnp.asarray([h, w], jnp.int32)
    for img, _, flipped in image_pyramid(image, scales, is_flip):
        probs = predict_bucket_fn(img)
        if acc is None:
            acc = jnp.zeros(out_b + (probs.shape[-1],), jnp.float32)
        in_hw = jnp.asarray(img.shape[:2], jnp.int32)
        acc = _resize_accumulate(acc, probs, in_hw, out_hw,
                                 out_bucket=out_b, flip=bool(flipped))
        n += 1
    # download the whole bucket and crop on HOST: a device [:h, :w]
    # slice would compile per exact image shape — the very cost this
    # path exists to avoid
    return np.asarray(acc)[:h, :w] / n
