"""Inference engine: sliding-window embeddings, per-image clustering,
prototype building and KNN semantic prediction.

Behavioral reference in twke18/SPML:
* pyscripts/inference/inference.py:114-228 — resize larger side to
  test.image_size, pad to crop grid, sliding-window
  generate_embeddings(resize_as_input=True) with overlap averaging of
  L2-normalized embeddings, fake zero labels padded with ignore, k-means,
  then Segsort.predictions;
* spml/models/predictions/segsort.py:68-125 — per-cluster prototypes,
  top-20 KNN against the memory bank, majority vote, scatter to pixels
  (the reference's 10-way chunking is a GPU memory hack; one MXU matmul
  here);
* pyscripts/inference/prototype.py:150-227 — same pipeline on the train
  split with majority ground-truth labels -> {prototype,prototype_label}
  .npy memory banks.

TPU notes: the whole per-image pipeline (patch forward, overlap
accumulation, clustering, KNN) stays ON DEVICE — only the input patches
go up and the small prediction/prototype arrays come down.

Compile-latency control (compiles over the axon tunnel cost minutes):
* padded shapes are BUCKETED up to crop + k*stride per axis, so the
  set of jitted shapes is finite and small regardless of the dataset's
  aspect-ratio spread (the extra padding carries ignore labels, which
  the clustering masks out exactly like the reference's 255-padding,
  inference.py:146-156);
* InferenceEngine.warmup() AOT-compiles the patch/cluster programs for
  every bucket reachable under test.image_size, so per-image latency is
  steady-state from the first image;
* spml_tpu.cli enables the JAX persistent compilation cache, so warmup
  cost is paid once per machine, not once per process.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.data import transforms
from spml_tpu.ops import common, kmeans, knn


def patch_ends(pad: int, crop: int, stride: int) -> np.ndarray:
    """End indices of sliding-window patches (inference.py:164-171)."""
    n = int(math.ceil((pad - crop) / stride)) + 1
    return np.linspace(crop, pad, n).astype(np.int32)


def bucket_dim(size: int, crop: int, stride: int) -> int:
    """Round a padded dimension up to crop + k*stride so distinct image
    sizes share compiled programs (shared by the KNN and softmax
    engines)."""
    if size <= crop:
        return crop
    k = int(math.ceil((size - crop) / stride))
    return crop + k * stride


def device_member_resize(base_img, base_hw, member_hw, flip,
                         member_bucket):
    """Build one pyramid member from the device-resident base image:
    bilinear scale resize (cv2.INTER_LINEAR semantics) + optional
    horizontal flip (traced flag), all at static bucket shapes with
    traced valid sizes. Pixels past the member's valid size are zeroed,
    matching resize_with_pad(0.0). Shared by the KNN and softmax fused
    member programs."""
    from spml_tpu.inference.msc import bilinear_resize_weights
    mb_h, mb_w = member_bucket
    bh = base_hw[0].astype(jnp.float32)
    bw = base_hw[1].astype(jnp.float32)
    mh = member_hw[0].astype(jnp.float32)
    mw = member_hw[1].astype(jnp.float32)
    wr = bilinear_resize_weights(mb_h, base_img.shape[0], mh, bh, False)
    wc = bilinear_resize_weights(mb_w, base_img.shape[1], mw, bw,
                                 flip != 0)
    member = jnp.einsum("oi,iwc->owc", wr, base_img,
                        preferred_element_type=jnp.float32)
    member = jnp.einsum("pw,owc->opc", wc, member,
                        preferred_element_type=jnp.float32)
    row = jnp.arange(mb_h, dtype=jnp.int32)[:, None]
    col = jnp.arange(mb_w, dtype=jnp.int32)[None, :]
    inside = (row < member_hw[0]) & (col < member_hw[1])
    return jnp.where(inside[..., None], member, 0.0)


def run_warmup_thunks(thunks, workers: int = 4) -> None:
    """Execute warmup compile thunks on a thread pool: XLA compiles
    parallelize across threads even over the tunneled backend (measured
    ~2x with 2 threads, pyscripts/misc/parallel_compile_probe.py), so
    the per-bucket program warmup pays ~workers fewer sequential
    multi-minute compiles. Execution afterwards serializes on the
    device but is negligible next to the compiles."""
    import concurrent.futures

    import jax as _jax
    if len(thunks) <= 1:
        for t in thunks:
            _jax.block_until_ready(t())
        return
    with concurrent.futures.ThreadPoolExecutor(workers) as pool:
        for out in pool.map(lambda t: t(), thunks):
            _jax.block_until_ready(out)


class InferenceEngine:
    def __init__(self, config, emb_model, variables):
        self.config = config
        self.emb_model = emb_model
        self.variables = variables
        self.crop = tuple(config.test.crop_size)
        self.stride = tuple(config.test.stride)
        self.pad_buckets = bool(
            getattr(config.tpu, "pad_to_stride_buckets", True))
        # images upload in the model's compute dtype: with bf16 convs
        # the first conv casts anyway, so a bf16 upload is free accuracy
        # -wise and halves the per-image transfer over the tunnel
        self._img_dtype = (jnp.bfloat16
                           if config.tpu.compute_dtype == "bfloat16"
                           else jnp.float32)
        self._embed_patch = jax.jit(self._embed_patch_impl)
        self._accumulate = jax.jit(self._accumulate_impl)
        self._cluster_predict = jax.jit(
            self._cluster_predict_impl, static_argnames=("num_classes",))
        self._cluster_probs = jax.jit(
            self._cluster_probs_impl, static_argnames=("num_classes",))
        self._fused_probs = jax.jit(
            self._fused_probs_impl, static_argnames=("num_classes",))
        self._fused_member = jax.jit(
            self._fused_member_impl,
            static_argnames=("num_classes", "member_bucket"))
        self._fused_member_pair = jax.jit(
            self._fused_member_pair_impl,
            static_argnames=("num_classes", "member_bucket"))
        self._member_pair_acc = jax.jit(
            self._member_pair_acc_impl,
            static_argnames=("num_classes", "member_bucket"),
            donate_argnums=(0,))
        self._fused_predict = jax.jit(
            self._fused_predict_impl, static_argnames=("num_classes",))
        self._batch_predict_cache = {}
        self._fused_prototype = jax.jit(
            self._fused_prototype_impl, static_argnames=("num_classes",))
        self._majority = jax.jit(
            self._majority_impl,
            static_argnames=("num_segments", "num_bins"))

    # -- per-crop forward (compiles once per crop shape) --
    def _embed_patch_impl(self, image):
        emb, _ = self.emb_model.apply(self.variables, image, train=False,
                                      resize_as_input=True)
        return common.normalize_embedding(emb.astype(jnp.float32))

    @staticmethod
    def _accumulate_impl(total, counts, emb, sh, sw):
        cur = jax.lax.dynamic_slice(total, (sh, sw, 0), emb.shape)
        total = jax.lax.dynamic_update_slice(total, cur + emb,
                                             (sh, sw, 0))
        ccur = jax.lax.dynamic_slice(counts, (sh, sw, 0),
                                     (emb.shape[0], emb.shape[1], 1))
        counts = jax.lax.dynamic_update_slice(counts, ccur + 1.0,
                                              (sh, sw, 0))
        return total, counts

    def _bucket(self, size: int, crop: int, stride: int) -> int:
        return bucket_dim(size, crop, stride)

    def bucket_shape(self, h: int, w: int) -> tuple[int, int]:
        if not self.pad_buckets:
            return max(h, self.crop[0]), max(w, self.crop[1])
        return (self._bucket(h, self.crop[0], self.stride[0]),
                self._bucket(w, self.crop[1], self.stride[1]))

    def upload_image(self, image_np: np.ndarray) -> jnp.ndarray:
        """Host->device image transfer in the compute dtype (bf16 halves
        the bytes over the tunnel; the model's first conv casts to bf16
        either way)."""
        if self._img_dtype == jnp.bfloat16:
            import ml_dtypes
            return jnp.asarray(image_np.astype(ml_dtypes.bfloat16))
        return jnp.asarray(image_np.astype(np.float32, copy=False))

    def warmup(self, max_hw: int | None = None, num_classes: int | None = None,
               memory=None, with_probs: bool = False,
               device_pyramid: bool = False, kinds=None) -> list:
        """AOT-compile the fused per-bucket programs for every pad
        bucket reachable for images whose larger side <= max_hw
        (default test.image_size, falling back to crop). `memory` must
        be the ACTUAL (protos, labels, valid) arrays that will be passed
        later — their shapes are part of the compiled signature.

        kinds: which program families to warm, any of
          "predict"   — _fused_predict (single-scale KNN prediction)
          "prototype" — _fused_prototype (memory-bank build)
          "probs"     — _fused_probs (per-member probs, CRF paths)
          "pyramid"   — _fused_member (device MSC pyramid)
        Defaults from the legacy flags: pyramid if device_pyramid,
        else probs if with_probs, else predict.
        Returns the warmed [Hp, Wp] bucket list."""
        cfg = self.config
        if kinds is None:
            kinds = (("pyramid",) if device_pyramid
                     else ("probs",) if with_probs else ("predict",))
        if max_hw is None:
            max_hw = cfg.test.image_size or max(self.crop)
        if num_classes is None:
            num_classes = cfg.dataset.num_classes
        hs = sorted({self._bucket(s, self.crop[0], self.stride[0])
                     for s in range(1, max_hw + 1)})
        ws = sorted({self._bucket(s, self.crop[1], self.stride[1])
                     for s in range(1, max_hw + 1)})
        base_max = cfg.test.image_size or max(self.crop)
        bhs = sorted({self._bucket(s, self.crop[0], self.stride[0])
                      for s in range(1, base_max + 1)})
        bws = sorted({self._bucket(s, self.crop[1], self.stride[1])
                      for s in range(1, base_max + 1)})
        if memory is not None:
            mem_p, mem_l, mem_v = memory
        else:
            mem_p = jnp.zeros((20, cfg.network.embedding_dim),
                              jnp.float32)
            mem_l = jnp.zeros((20,), jnp.int32)
            mem_v = jnp.zeros((20,), bool)
        warmed = []
        thunks = []
        for ph in hs:
            for pw in ws:
                # an image can only reach bucket (ph, pw) if its aspect
                # fits under max_hw; still warm the full grid — it's
                # small and warming an unused shape is harmless
                img = jnp.zeros((ph, pw, 3), self._img_dtype)
                hw = jnp.asarray([ph, pw], jnp.int32)
                if "pyramid" in kinds:
                    # one fused PAIR+ACCUMULATE program (both flips
                    # share an embed batch; accumulator donated) per
                    # (base bucket, member bucket); the base bucket set
                    # is what unscaled inputs (<= test.image_size) reach
                    for bh_ in bhs:
                        for bw_ in bws:
                            thunks.append(
                                lambda hw=hw, bh_=bh_, bw_=bw_,
                                ph=ph, pw=pw:
                                self._member_pair_acc(
                                    jnp.zeros((bh_, bw_, num_classes),
                                              jnp.float32),
                                    jnp.zeros((bh_, bw_, 3),
                                              self._img_dtype),
                                    jnp.asarray([bh_, bw_], jnp.int32),
                                    hw,
                                    jnp.asarray([bh_, bw_], jnp.int32),
                                    mem_p, mem_l, mem_v,
                                    num_classes=num_classes,
                                    member_bucket=(ph, pw)))
                if "probs" in kinds:
                    thunks.append(lambda img=img, hw=hw:
                                  self._fused_probs(
                                      img, hw, mem_p, mem_l, mem_v,
                                      num_classes=num_classes))
                if "predict" in kinds:
                    thunks.append(lambda img=img, hw=hw:
                                  self._fused_predict(
                                      img, hw, mem_p, mem_l, mem_v,
                                      num_classes=num_classes))
                if "prototype" in kinds:
                    thunks.append(lambda img=img, hw=hw, ph=ph, pw=pw:
                                  self._fused_prototype(
                                      img,
                                      jnp.zeros((ph, pw), jnp.uint8),
                                      hw, num_classes=num_classes))
                warmed.append((ph, pw))
        if "pyramid" in kinds or "probs" in kinds:
            # MSC's bucket-static resize/accumulate programs:
            # one per (member-bucket, base-bucket, flip)
            from spml_tpu.inference import msc as msc_lib
            hw = jnp.asarray([self.crop[0], self.crop[1]], jnp.int32)
            for pb in warmed:
                probs = jnp.zeros(pb + (num_classes,), jnp.float32)
                for ob in warmed:
                    acc = jnp.zeros(ob + (num_classes,), jnp.float32)
                    for flip in (False, True):
                        thunks.append(
                            lambda acc=acc, probs=probs, hw=hw,
                            ob=ob, flip=flip:
                            msc_lib._resize_accumulate(
                                acc, probs, hw, hw, out_bucket=ob,
                                flip=flip))
        run_warmup_thunks(thunks)
        return warmed

    def stitched_embeddings(self, image: np.ndarray) -> jnp.ndarray:
        """image: [H, W, 3] already resized/normalized; returns
        overlap-averaged normalized embeddings [Hp, Wp, D] ON DEVICE."""
        crop_h, crop_w = self.crop
        h0, w0 = image.shape[:2]
        pad_h, pad_w = self.bucket_shape(h0, w0)
        img = transforms.resize_with_pad(image, (pad_h, pad_w), 0.0)
        ends_h = patch_ends(pad_h, crop_h, self.stride[0])
        ends_w = patch_ends(pad_w, crop_w, self.stride[1])

        img_dev = jnp.asarray(img)
        total = None
        counts = jnp.zeros((pad_h, pad_w, 1), jnp.float32)
        for eh in ends_h:
            for ew in ends_w:
                sh, sw = int(eh - crop_h), int(ew - crop_w)
                patch = jax.lax.dynamic_slice(
                    img_dev, (sh, sw, 0), (crop_h, crop_w, 3))
                emb = self._embed_patch(patch[None])[0]
                if total is None:
                    total = jnp.zeros((pad_h, pad_w, emb.shape[-1]),
                                      jnp.float32)
                total, counts = self._accumulate(total, counts, emb,
                                                 sh, sw)
        return total / counts

    # -- clustering + prediction on the stitched map --
    def _cluster_predict_impl(self, emb, sem_label, inst_label,
                              memory_protos, memory_labels, memory_valid,
                              num_classes: int):
        h, w, d = emb.shape
        cfg = self.config
        k_clusters = tuple(cfg.network.kmeans_num_clusters)
        # fake zero labels -> segments == occupied k-means clusters, so
        # the capacity is the cluster-grid size and the single-group
        # fast path applies (skips the sort-based compaction; exact up
        # to segment relabeling, which everything downstream is
        # invariant to — kmeans.segment_batch_single_group)
        capacity = int(np.prod(k_clusters))
        segs, emb_flat = kmeans.segment_batch_single_group(
            emb[None], jnp.broadcast_to(
                common.generate_location_features(h, w) - 0.5,
                (1, h, w, 2)),
            sem_label[None], k_clusters, cfg.network.kmeans_iterations,
            cfg.dataset.semantic_ignore_index)
        del inst_label  # uniform zero under fake labels
        seg_ids = segs.pixel_segment_ids[0]
        pix_valid = segs.pixel_valid[0]
        protos = kmeans.calculate_prototypes_from_labels(
            emb_flat[0], seg_ids, capacity,
            pix_valid.astype(jnp.float32))
        seg_valid = segs.segment_valid[0]

        topk = knn.top_k_ranking(
            protos, jnp.zeros((capacity,), jnp.int32),
            memory_protos, memory_labels, 20,
            seg_valid, memory_valid)[1]
        majority = knn.majority_label_from_topk(topk, num_classes)
        pixel_pred = jnp.take(majority, seg_ids).reshape(h, w)
        return pixel_pred, seg_ids.reshape(h, w), protos, seg_valid, topk

    def _cluster_probs_impl(self, emb, sem_label, inst_label,
                            memory_protos, memory_labels, memory_valid,
                            num_classes: int):
        """[Hp, Wp, C] per-pixel probabilities = mean one-hot of each
        segment's top-20 retrieved labels, entirely on device
        (inference_msc.py:221-240). Keeps the MSC inner loop (10 pyramid
        members/image) free of per-member host scatters."""
        _, seg_map, _, _, topk = self._cluster_predict_impl(
            emb, sem_label, inst_label, memory_protos, memory_labels,
            memory_valid, num_classes)
        oh = jax.nn.one_hot(topk, num_classes, dtype=jnp.float32)
        seg_probs = jnp.mean(oh, axis=1)                 # [capacity, C]
        h, w = seg_map.shape
        return jnp.take(seg_probs, seg_map.reshape(-1),
                        axis=0).reshape(h, w, num_classes)

    def _fused_probs_impl(self, img, hw, memory_protos, memory_labels,
                          memory_valid, num_classes: int):
        """The WHOLE per-pyramid-member pipeline in one program:
        sliding-window patches -> batched embed forward -> overlap
        average -> k-means -> top-20 KNN probs. One dispatch per member
        instead of ~10-15 (each eager slice/accumulate/divide call costs
        a tunnel round-trip; MSC_PROFILE.json measured ~30 ms of device
        compute per 512-bucket member vs ~230 ms observed per member —
        the rest was dispatch).

        img: [Hb, Wb, 3] host-padded to the bucket; hw: [2] int32 valid
        (h, w) — traced, so one compiled program per bucket serves every
        image shape in it. Returns [Hb, Wb, C] device probs.
        """
        emb_map = self._stitch_impl(img)
        sem, inst = self._traced_fake_labels(img.shape[:2], hw)
        return self._cluster_probs_impl(
            emb_map, sem, inst, memory_protos, memory_labels,
            memory_valid, num_classes)

    def _stitch_impl(self, img):
        """Sliding-window patches -> ONE batched embed forward ->
        overlap-averaged [Hb, Wb, D] embedding map, all in-graph (the
        traced core of every fused program; static patch grid per
        bucket)."""
        return self._stitch_batched_impl(img[None])[0]

    def _stitch_batched_impl(self, imgs):
        """_stitch_impl over a leading batch axis: every image's
        patches join ONE embed forward (batch = n_images x n_windows),
        so e.g. an MSC flip pair costs one larger — better-utilized —
        conv batch instead of two dispatches."""
        crop_h, crop_w = self.crop
        n, pad_h, pad_w = imgs.shape[:3]
        ends_h = [int(e) for e in patch_ends(pad_h, crop_h,
                                             self.stride[0])]
        ends_w = [int(e) for e in patch_ends(pad_w, crop_w,
                                             self.stride[1])]
        windows = [(eh - crop_h, ew - crop_w)
                   for eh in ends_h for ew in ends_w]

        # [n_win, n, crop, crop, 3] -> [n_win * n, ...]
        patches = jnp.stack([imgs[:, sh:sh + crop_h, sw:sw + crop_w]
                             for sh, sw in windows])
        patches = patches.reshape((-1,) + patches.shape[2:])
        emb, _ = self.emb_model.apply(self.variables, patches,
                                      train=False, resize_as_input=True)
        emb = common.normalize_embedding(emb.astype(jnp.float32))
        emb = emb.reshape((len(windows), n) + emb.shape[1:])

        total = jnp.zeros((n, pad_h, pad_w, emb.shape[-1]), jnp.float32)
        counts = jnp.zeros((n, pad_h, pad_w, 1), jnp.float32)
        for k, (sh, sw) in enumerate(windows):
            total = total.at[:, sh:sh + crop_h,
                             sw:sw + crop_w].add(emb[k])
            counts = counts.at[:, sh:sh + crop_h,
                               sw:sw + crop_w].add(1.0)
        return total / counts

    def _traced_fake_labels(self, pad_shape, hw):
        """Fake zero labels with ignore outside the traced valid size
        (== _fake_labels, but in-graph)."""
        pad_h, pad_w = pad_shape
        ignore = self.config.dataset.semantic_ignore_index
        row = jnp.arange(pad_h, dtype=jnp.int32)[:, None]
        col = jnp.arange(pad_w, dtype=jnp.int32)[None, :]
        inside = (row < hw[0]) & (col < hw[1])
        sem = jnp.where(inside, 0, ignore).astype(jnp.int32)
        inst = jnp.zeros((pad_h, pad_w), jnp.int32)
        return sem, inst

    def _fused_predict_impl(self, img, hw, memory_protos, memory_labels,
                            memory_valid, num_classes: int):
        """Whole single-scale KNN prediction (pad->patches->embed->
        stitch->k-means->top-20 majority) as one program per bucket;
        returns the [Hb, Wb] prediction as uint16 so the per-image
        download is ~0.5 MB instead of ~1 MB int32 over the tunnel."""
        emb_map = self._stitch_impl(img)
        sem, inst = self._traced_fake_labels(img.shape[:2], hw)
        pred, _, _, _, _ = self._cluster_predict_impl(
            emb_map, sem, inst, memory_protos, memory_labels,
            memory_valid, num_classes)
        return pred.astype(jnp.uint16)

    def _fused_predict_batch_impl(self, imgs, hws, memory_protos,
                                  memory_labels, memory_valid,
                                  num_classes: int):
        """_fused_predict_impl vmapped over a leading image axis —
        bulk KNN inference as ONE program. With the image axis sharded
        over a Mesh('data'), GSPMD runs each device's images locally
        (the memory bank is replicated), so bulk throughput scales with
        chips. No reference counterpart: inference.py:114-228 is a
        strictly per-image, single-GPU loop."""
        return jax.vmap(
            lambda im, hw: self._fused_predict_impl(
                im, hw, memory_protos, memory_labels, memory_valid,
                num_classes))(imgs, hws)

    def _batch_predict_fn(self, mesh):
        if mesh not in self._batch_predict_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            # pjit forbids kwargs with in_shardings -> positional static
            self._batch_predict_cache[mesh] = jax.jit(
                self._fused_predict_batch_impl,
                static_argnums=(5,),
                in_shardings=(data, data, repl, repl, repl),
                out_shardings=data)
        return self._batch_predict_cache[mesh]

    def predict_semantic_batch(self, images, memory_protos,
                               memory_labels, memory_valid,
                               mesh=None) -> list[np.ndarray]:
        """Data-parallel bulk single-scale KNN inference: the image
        group is padded to its max pad bucket and run as one vmapped
        program with the image axis sharded over `mesh` ('data' axis;
        None = single device). Returns per-image [h, w] int32
        predictions. Images sharing a pad bucket produce bit-identical
        results to predict_semantic; mixing buckets in one group shifts
        the sliding-window grid of the smaller images (the same
        documented caveat as pad bucketing itself), so callers group
        per bucket for exactness (runner does)."""
        if not images:
            return []
        n = len(images)
        shapes = [im.shape[:2] for im in images]
        pads = [self.bucket_shape(h, w) for h, w in shapes]
        pad = (max(p[0] for p in pads), max(p[1] for p in pads))
        n_dev = int(np.prod(list(mesh.shape.values()))) if mesh else 1
        m = -(-n // n_dev) * n_dev  # pad group to device-count multiple
        imgs = np.stack([
            transforms.resize_with_pad(images[min(i, n - 1)], pad, 0.0)
            for i in range(m)])
        hws = np.asarray([shapes[min(i, n - 1)] for i in range(m)],
                         np.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            imgs_dev = jax.device_put(
                jnp.asarray(imgs, self._img_dtype), data)
            hws_dev = jax.device_put(jnp.asarray(hws), data)
            mem = [jax.device_put(x, repl) for x in
                   (memory_protos, memory_labels, memory_valid)]
            fn = self._batch_predict_fn(mesh)
        else:
            imgs_dev = jnp.asarray(imgs, self._img_dtype)
            hws_dev = jnp.asarray(hws)
            mem = (memory_protos, memory_labels, memory_valid)
            if None not in self._batch_predict_cache:
                self._batch_predict_cache[None] = jax.jit(
                    self._fused_predict_batch_impl,
                    static_argnums=(5,))
            fn = self._batch_predict_cache[None]
        preds = np.asarray(fn(imgs_dev, hws_dev, *mem,
                              self.config.dataset.num_classes))
        return [preds[i, :h, :w].astype(np.int32)
                for i, (h, w) in enumerate(shapes[:n])]

    def _fused_prototype_impl(self, img, real_sem, hw, num_classes: int):
        """Whole memory-bank entry build (prototype.py:184-227) as one
        program per bucket: stitch -> fake-label k-means -> prototypes +
        majority REAL label per cluster. real_sem: [Hb, Wb] uint8 padded
        with ignore (uint8 keeps the upload at 1 byte/px over the
        tunnel). Returns (protos, labels, seg_valid, seg_map u16)."""
        real_sem = real_sem.astype(jnp.int32)
        emb_map = self._stitch_impl(img)
        sem, inst = self._traced_fake_labels(img.shape[:2], hw)
        dim = emb_map.shape[-1]
        dummy_p = jnp.zeros((20, dim), jnp.float32)
        dummy_l = jnp.zeros((20,), jnp.int32)
        dummy_v = jnp.zeros((20,), bool)
        _, seg_map, protos, seg_valid, _ = self._cluster_predict_impl(
            emb_map, sem, inst, dummy_p, dummy_l, dummy_v, num_classes)
        ignore = self.config.dataset.semantic_ignore_index
        labels = self._majority_impl(seg_map, real_sem,
                                     real_sem != ignore,
                                     int(protos.shape[0]), num_bins=256)
        return protos, labels, seg_valid, seg_map.astype(jnp.uint16)

    def _fused_member_impl(self, base_img, base_hw, member_hw, flip,
                           memory_protos, memory_labels, memory_valid,
                           num_classes: int, member_bucket):
        """A whole pyramid MEMBER from the base image, on device: the
        bilinear scale resize (+ optional horizontal flip) happens here
        instead of on the host, so an MSC image uploads its base ONCE
        (~3 MB) instead of one resized member per (scale, flip)
        (~22 MB/image — at the tunnel's measured ~20-30 MB/s the
        transfers, not compute, were the whole MSC latency).

        base_img: [Hb0, Wb0, 3] host-padded base; base_hw/member_hw: [2]
        int32 valid sizes (traced); flip: [] int32/bool (traced — one
        program serves both flips); member_bucket: static (Hb, Wb) of
        the member's pad bucket. The resize is the same
        half-pixel-center, edge-clamped 2-tap bilinear as
        msc._resize_accumulate == cv2.INTER_LINEAR — the reference's
        image resize kernel (inference_msc.py:150-160); pixels past the
        member's valid size are zeroed, matching resize_with_pad(0.0).
        """
        member = device_member_resize(base_img, base_hw, member_hw, flip,
                                      member_bucket)
        return self._fused_probs_impl(
            member, member_hw, memory_protos, memory_labels,
            memory_valid, num_classes)

    def _fused_member_pair_impl(self, base_img, base_hw, member_hw,
                                memory_protos, memory_labels,
                                memory_valid, num_classes: int,
                                member_bucket):
        """Both flips of one pyramid scale in ONE program: the two
        members' windows share a single embed forward (batch = 2 x
        n_windows) and the clustering/KNN stages vmap over the pair —
        halving the MSC dispatch count and doubling the conv batch.
        Returns [2, Hb, Wb, C] probs; index 1 is the flipped member
        STILL in flipped orientation (msc._resize_accumulate un-flips
        during accumulation, same as the single-member path)."""
        import functools as _ft
        m0 = device_member_resize(base_img, base_hw, member_hw,
                                  jnp.asarray(0, jnp.int32),
                                  member_bucket)
        m1 = device_member_resize(base_img, base_hw, member_hw,
                                  jnp.asarray(1, jnp.int32),
                                  member_bucket)
        embs = self._stitch_batched_impl(jnp.stack([m0, m1]))
        sem, inst = self._traced_fake_labels(member_bucket, member_hw)
        cluster = _ft.partial(
            self._cluster_probs_impl, sem_label=sem, inst_label=inst,
            memory_protos=memory_protos, memory_labels=memory_labels,
            memory_valid=memory_valid, num_classes=num_classes)
        return jax.vmap(lambda e: cluster(e))(embs)

    def _member_pair_acc_impl(self, acc, base_img, base_hw, member_hw,
                              out_hw, memory_protos, memory_labels,
                              memory_valid, num_classes: int,
                              member_bucket):
        """_fused_member_pair_impl + BOTH resize/un-flip/accumulate
        steps in the same program, acc donated: one dispatch per
        pyramid scale instead of three (pair + 2 accumulates) — each
        dispatch is a tunnel round-trip in this environment."""
        from spml_tpu.inference import msc as msc_lib
        pair = self._fused_member_pair_impl(
            base_img, base_hw, member_hw, memory_protos, memory_labels,
            memory_valid, num_classes=num_classes,
            member_bucket=member_bucket)
        acc = msc_lib.resize_accumulate_body(acc, pair[0], member_hw,
                                             out_hw, flip=False)
        return msc_lib.resize_accumulate_body(acc, pair[1], member_hw,
                                              out_hw, flip=True)

    @staticmethod
    def _majority_impl(seg_map, labels, valid, num_segments, num_bins: int):
        """Per-segment label histograms -> majority label (on device)."""
        oh = common.one_hot(labels.reshape(-1), num_bins)
        oh = oh * valid.reshape(-1, 1).astype(oh.dtype)
        counts = common.segment_sum(oh, seg_map.reshape(-1), num_segments)
        return jnp.argmax(counts, axis=-1).astype(jnp.int32)

    def _fake_labels(self, pad_h, pad_w, h, w):
        sem = np.zeros((pad_h, pad_w), np.int32)
        sem[h:, :] = self.config.dataset.semantic_ignore_index
        sem[:, w:] = self.config.dataset.semantic_ignore_index
        inst = np.zeros((pad_h, pad_w), np.int32)
        return jnp.asarray(sem), jnp.asarray(inst)

    def predict_semantic(self, image: np.ndarray, memory_protos,
                         memory_labels, memory_valid,
                         fused: bool = True) -> np.ndarray:
        """Full single-scale KNN inference for one (resized) image.
        Returns [H, W] int32 class prediction at the image's resolution.
        fused=True runs it as one program per bucket (fused=False keeps
        the eager-stitched path; parity-tested)."""
        h, w = image.shape[:2]
        if fused:
            pad = self.bucket_shape(h, w)
            img = transforms.resize_with_pad(image, pad, 0.0)
            pred = self._fused_predict(
                self.upload_image(img),
                jnp.asarray([h, w], jnp.int32),
                memory_protos, memory_labels, memory_valid,
                num_classes=self.config.dataset.num_classes)
            return np.asarray(pred)[:h, :w].astype(np.int32)
        emb_map = self.stitched_embeddings(image)
        pad_h, pad_w = emb_map.shape[:2]
        sem, inst = self._fake_labels(pad_h, pad_w, h, w)
        pred, _, _, _, _ = self._cluster_predict(
            emb_map, sem, inst, memory_protos, memory_labels,
            memory_valid, num_classes=self.config.dataset.num_classes)
        return np.asarray(pred)[:h, :w]

    def predict_topk_probs(self, image: np.ndarray, memory_protos,
                           memory_labels, memory_valid,
                           device_out: bool = False,
                           bucket_out: bool = False,
                           fused: bool = True):
        """[H, W, C] probabilities from averaging one-hot top-20 labels
        (inference_msc.py:221-240); used by MSC / CRF variants.

        device_out=True returns the device array; bucket_out=True
        additionally skips the [:h, :w] crop and returns the full
        bucket-shaped map — the crop is an exact-shape eager op that
        compiles per distinct image size over the tunnel, so the MSC
        path keeps everything bucket-shaped
        (msc.msc_predict_probs_bucketed).

        fused=True (default) runs pad->patches->embed->stitch->cluster->
        probs as ONE jitted program per bucket (_fused_probs_impl);
        fused=False keeps the original eager-stitched path (same math,
        parity-tested in tests/test_inference.py)."""
        c = self.config.dataset.num_classes
        h, w = image.shape[:2]
        if fused:
            pad_h, pad_w = self.bucket_shape(h, w)
            img = transforms.resize_with_pad(image, (pad_h, pad_w), 0.0)
            probs = self._fused_probs(
                self.upload_image(img),
                jnp.asarray([h, w], jnp.int32),
                memory_protos, memory_labels, memory_valid,
                num_classes=c)
        else:
            emb_map = self.stitched_embeddings(image)
            pad_h, pad_w = emb_map.shape[:2]
            sem, inst = self._fake_labels(pad_h, pad_w, h, w)
            probs = self._cluster_probs(
                emb_map, sem, inst, memory_protos, memory_labels,
                memory_valid, num_classes=c)
        if bucket_out:
            return probs
        if device_out:
            return probs[:h, :w]
        return np.asarray(probs)[:h, :w]

    def predict_member_probs(self, base_dev, base_hw, member_hw: tuple,
                             flip: bool, memory_protos, memory_labels,
                             memory_valid):
        """One pyramid member's bucket-shaped [Hb, Wb, C] device probs
        from the device-resident base image (see _fused_member_impl).
        base_dev: [Hb0, Wb0, 3] device array; base_hw: [2] int32 device
        array; member_hw: python (h, w) of the scaled member."""
        member_bucket = self.bucket_shape(*member_hw)
        return self._fused_member(
            base_dev, base_hw, jnp.asarray(member_hw, jnp.int32),
            jnp.asarray(1 if flip else 0, jnp.int32),
            memory_protos, memory_labels, memory_valid,
            num_classes=self.config.dataset.num_classes,
            member_bucket=member_bucket)

    def predict_member_pair_probs(self, base_dev, base_hw,
                                  member_hw: tuple, memory_protos,
                                  memory_labels, memory_valid):
        """Both flips of one pyramid scale as ONE fused program
        (see _fused_member_pair_impl): [2, Hb, Wb, C] device probs,
        index 1 still in flipped orientation."""
        member_bucket = self.bucket_shape(*member_hw)
        return self._fused_member_pair(
            base_dev, base_hw, jnp.asarray(member_hw, jnp.int32),
            memory_protos, memory_labels, memory_valid,
            num_classes=self.config.dataset.num_classes,
            member_bucket=member_bucket)

    def accumulate_member_pair(self, acc, base_dev, base_hw,
                               member_hw: tuple, out_hw, memory_protos,
                               memory_labels, memory_valid):
        """One dispatch per pyramid scale: both flips' probs computed,
        resized to the base bucket, un-flipped, and accumulated into
        the DONATED acc (see _member_pair_acc_impl)."""
        member_bucket = self.bucket_shape(*member_hw)
        return self._member_pair_acc(
            acc, base_dev, base_hw, jnp.asarray(member_hw, jnp.int32),
            out_hw, memory_protos, memory_labels, memory_valid,
            num_classes=self.config.dataset.num_classes,
            member_bucket=member_bucket)

    def build_prototypes(self, image: np.ndarray,
                         semantic_label: np.ndarray,
                         return_clusters: bool = False,
                         fused: bool = True):
        """Memory-bank entry for one train image: k-means prototypes +
        majority ground-truth label (prototype.py:194-227).

        semantic_label: [H, W] at the image's (resized) resolution.
        Returns (prototypes [K, D], labels [K], valid [K]) and, when
        return_clusters, the [H, W] cluster-index map as a 4th element.
        fused=True runs it as one program per bucket with a uint8 label
        upload and uint16 cluster-map download (the eager path remains
        for parity tests)."""
        h, w = image.shape[:2]
        ignore = self.config.dataset.semantic_ignore_index
        if fused:
            pad = self.bucket_shape(h, w)
            img = transforms.resize_with_pad(image, pad, 0.0)
            real = np.full(pad, ignore, np.uint8)
            real[:h, :w] = semantic_label
            protos, labels, seg_valid, seg_map = self._fused_prototype(
                self.upload_image(img), jnp.asarray(real),
                jnp.asarray([h, w], jnp.int32),
                num_classes=self.config.dataset.num_classes)
            out = (np.asarray(protos), np.asarray(labels),
                   np.asarray(seg_valid))
            if return_clusters:
                return out + (np.asarray(seg_map)[:h, :w]
                              .astype(np.int32),)
            return out
        emb_map = self.stitched_embeddings(image)
        pad_h, pad_w = emb_map.shape[:2]
        sem, inst = self._fake_labels(pad_h, pad_w, h, w)
        dummy_mem = jnp.zeros((20, emb_map.shape[-1]), jnp.float32)
        _, seg_map, protos, seg_valid, _ = self._cluster_predict(
            emb_map, sem, inst, dummy_mem, jnp.zeros((20,), jnp.int32),
            jnp.zeros((20,), bool),
            num_classes=self.config.dataset.num_classes)

        # majority REAL label per cluster over valid pixels (on device)
        real = np.full((pad_h, pad_w), ignore, np.int32)
        real[:h, :w] = semantic_label
        real_dev = jnp.asarray(real)
        labels = self._majority(seg_map, real_dev, real_dev != ignore,
                                int(protos.shape[0]), num_bins=256)
        out = (np.asarray(protos), np.asarray(labels),
               np.asarray(seg_valid))
        if return_clusters:
            return out + (np.asarray(seg_map)[:h, :w],)
        return out


def save_prototypes(path: str, prototypes: np.ndarray,
                    labels: np.ndarray) -> None:
    """Same npy dict layout as the reference (prototype.py:222-225)."""
    np.save(path, {"prototype": prototypes, "prototype_label": labels})


def load_memory_banks(memory_dir: str):
    """Concat {prototype, prototype_label} npys
    (spml/utils/segsort/others.py:11-41)."""
    protos, labels = [], []
    for name in sorted(os.listdir(memory_dir)):
        if not name.endswith(".npy"):
            continue
        data = np.load(os.path.join(memory_dir, name),
                       allow_pickle=True).item()
        protos.append(data["prototype"])
        labels.append(data["prototype_label"])
    return np.concatenate(protos, 0), np.concatenate(labels, 0)
