"""Shared drivers behind the pyscripts/inference CLIs.

Behavioral reference (twke18/SPML pyscripts/inference/):
* prototype.py / prototype_msc.py — memory-bank building (single /
  multi-scale concat at [0.5, 1, 1.5], prototype_msc.py:94-95);
* inference.py / inference_msc.py / inference_crf[_msc].py — KNN
  prediction, optional scale-flip prob averaging, optional DenseCRF over
  the top-20 one-hot probability maps; predictions resized back to the
  original image size with nearest interpolation (inference.py:236-240);
* inference_softmax*.py — classifier logits, MSC and/or CRF;
* pseudo_camrw_crf.py / pseudo_softmaxrw_crf.py / pseudo_softmax.py /
  pseudo_inference_crf_msc.py / pseudo_denseposerw_crf.py — pseudo-label
  generation via CAM/softmax/KNN scores + affinity random walk (+CRF).
"""

from __future__ import annotations

import collections
import os

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu import cli
from spml_tpu.data import transforms
from spml_tpu.inference import engine as engine_lib
from spml_tpu.inference import msc as msc_lib
from spml_tpu.inference.softmax import SoftmaxInferenceEngine
from spml_tpu.ops import common, randomwalk
from spml_tpu.utils import vis


class _PredictBatcher:
    """Groups same-pad-bucket images and runs them through ONE vmapped
    KNN-prediction program (engine.predict_semantic_batch) with the
    image axis sharded over the device mesh — bulk throughput scales
    with chips while outputs stay bit-identical to the per-image path
    (same bucket => same program; tests/test_batch_inference.py)."""

    def __init__(self, eng, memory, group_size: int, save):
        from spml_tpu.parallel import mesh as mesh_lib
        self.eng = eng
        self.memory = memory
        self.group = max(2, int(group_size))
        self.save = save  # save(pred, base, oh, ow)
        self.mesh = (mesh_lib.make_mesh()
                     if len(jax.devices()) > 1 else None)
        self._buckets: dict = {}

    def add(self, base: str, image: np.ndarray, oh: int, ow: int):
        key = self.eng.bucket_shape(*image.shape[:2])
        pend = self._buckets.setdefault(key, [])
        pend.append((base, image, oh, ow))
        if len(pend) >= self.group:
            self._flush(key)

    def _flush(self, key):
        pend = self._buckets.pop(key, [])
        if not pend:
            return
        preds = self.eng.predict_semantic_batch(
            [p[1] for p in pend], *self.memory, mesh=self.mesh)
        for (base, _, oh, ow), pred in zip(pend, preds):
            self.save(pred, base, oh, ow)

    def flush_all(self):
        for key in list(self._buckets):
            self._flush(key)


class _AsyncSink:
    """Bounded thread pool for the per-image HOST tail (DenseCRF +
    argmax + PNG save): ctypes releases the GIL during the C++ CRF, so
    the tail overlaps the NEXT image's device compute and scales across
    cores. In-flight items are bounded (each holds a [C, H, W] float32
    prob map, ~22 MB at 512/21 classes).

    The reference runs the CRF inline between forward passes
    (inference_crf.py main loop); outputs are per-image files, so
    completion order is irrelevant."""

    def __init__(self, workers=None, max_inflight=None):
        import concurrent.futures
        import os as _os
        workers = workers or min(8, _os.cpu_count() or 1)
        self._pool = concurrent.futures.ThreadPoolExecutor(workers)
        self._limit = max_inflight or 2 * workers
        self._pending = []

    def submit(self, fn, *args):
        self._pending.append(self._pool.submit(fn, *args))
        while len(self._pending) >= self._limit:
            self._pending.pop(0).result()

    def close(self):
        try:
            for f in self._pending:
                f.result()
        finally:
            self._pending.clear()
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, et, ev, tb):
        self.close()


def _maybe_resize_input(config, image, sem=None, inst=None):
    """Resize larger side to test.image_size when set
    (inference.py:123-134)."""
    if config.test.image_size > 0:
        image = transforms.resize_with_interpolation(
            image, config.test.image_size, method="bilinear")
        if sem is not None:
            sem = transforms.resize_with_interpolation(
                sem, config.test.image_size, method="nearest")
        if inst is not None:
            inst = transforms.resize_with_interpolation(
                inst, config.test.image_size, method="nearest")
    return image, sem, inst


def _resize_pred_to(pred, h, w):
    """Nearest label resize back to the original image size, on HOST.

    Same index arithmetic as ops/common.py::resize_labels (torch
    F.interpolate(nearest): src = floor(dst * in/out)) but in numpy:
    the device version costs one fresh XLA program PER UNIQUE ORIGINAL
    SHAPE over the tunnel (3-15 s each, STARTUP_PROBE.json) for an op
    that is a trivial integer gather on a label map already bound for
    the host. Exact equivalence locked by
    tests/test_host_init.py::test_host_resize_pred_matches_device.
    """
    pred = np.asarray(pred)
    ph, pw = pred.shape[-2:]
    # float32 index math to mirror the device arithmetic bit-for-bit:
    # the device path computes floor(dst * in/out) in f32 (x64 disabled),
    # and for commensurate shape pairs a float64 product can floor to an
    # adjacent source row (advisor round-3 finding).
    ys = np.floor(np.arange(h, dtype=np.float32)
                  * np.float32(ph / h)).astype(np.int64)
    xs = np.floor(np.arange(w, dtype=np.float32)
                  * np.float32(pw / w)).astype(np.int64)
    ys = np.minimum(ys, ph - 1)
    xs = np.minimum(xs, pw - 1)
    return pred[..., ys[:, None], xs[None, :]]


def _load_memory(args, config):
    protos, labels = engine_lib.load_memory_banks(args.semantic_memory_dir)
    keep = labels != config.dataset.semantic_ignore_index
    protos, labels = protos[keep], labels[keep]
    return (jnp.asarray(protos), jnp.asarray(labels),
            jnp.ones((protos.shape[0],), bool))


def _warm(eng, config, scales=(1.0,), memory=None,
          kinds=("predict",)):
    """AOT-warm the engine's shape buckets (documented cost: one
    compile per bucket, amortized across runs by the persistent cache)."""
    import time
    if config.test.image_size <= 0:
        return
    t0 = time.time()
    warmed = eng.warmup(
        max_hw=int(np.ceil(config.test.image_size * max(scales))),
        memory=memory, kinds=kinds)
    print(f"warmup: {len(warmed)} shape buckets in "
          f"{time.time() - t0:.1f}s", flush=True)


def _warm_softmax(eng, config, scales=(1.0,), device_pyramid=False):
    import time
    if config.test.image_size <= 0:
        return
    t0 = time.time()
    warmed = eng.warmup(
        max_hw=int(np.ceil(config.test.image_size * max(scales))),
        device_pyramid=device_pyramid)
    print(f"warmup: {len(warmed)} shape buckets in "
          f"{time.time() - t0:.1f}s", flush=True)


def run_prototype(args, config, scales=None, save_clusters=True):
    """Build the semantic memory bank over the train split; also saves
    the cluster-index maps (reference prototype.py:217-227 layout:
    semantic_cluster/ mode-'I' PNGs + semantic_cluster_rgb/)."""
    import PIL.Image
    eng_model = cli.build_eval_models(config, args.snapshot_dir)
    eng = engine_lib.InferenceEngine(config, *eng_model)
    _warm(eng, config, scales=scales or [1.0], kinds=("prototype",))
    out_dir = os.path.join(args.save_dir, "semantic_prototype")
    os.makedirs(out_dir, exist_ok=True)
    if save_clusters:
        cluster_dir = os.path.join(args.save_dir, "semantic_cluster")
        cluster_rgb_dir = os.path.join(args.save_dir,
                                       "semantic_cluster_rgb")
        os.makedirs(cluster_dir, exist_ok=True)
        os.makedirs(cluster_rgb_dir, exist_ok=True)
        color_map = vis.load_color_map(config.dataset.color_map_path)
    for _, base, image, sem, _ in cli.iterate_test_images(
            config, args.data_dir, args.data_list):
        image, sem, _ = _maybe_resize_input(config, image, sem)
        all_p, all_l = [], []
        for scale in (scales or [1.0]):
            h, w = image.shape[:2]
            img_s = transforms._resize_image(
                image, int(h * scale), int(w * scale)) \
                if scale != 1.0 else image
            sem_s = transforms._resize_nearest(
                sem, img_s.shape[0], img_s.shape[1]) \
                if scale != 1.0 else sem
            want_clusters = save_clusters and scale == 1.0
            result = eng.build_prototypes(img_s, sem_s,
                                          return_clusters=want_clusters)
            protos, labels, valid = result[:3]
            all_p.append(protos[valid])
            all_l.append(labels[valid])
            if want_clusters:
                clusters = result[3]
                PIL.Image.fromarray(clusters.astype(np.int32),
                                    mode="I").save(
                    os.path.join(cluster_dir, base))
                PIL.Image.fromarray(
                    vis.label_to_color(clusters % 256, color_map),
                    mode="RGB").save(
                    os.path.join(cluster_rgb_dir, base))
        engine_lib.save_prototypes(
            os.path.join(out_dir, base.replace(".png", ".npy")),
            np.concatenate(all_p, 0), np.concatenate(all_l, 0))
        print(f"prototype {base}", flush=True)


def run_knn_inference(args, config, msc=False, crf=False,
                      scales=(0.5, 0.75, 1, 1.25, 1.5)):
    eng_model = cli.build_eval_models(config, args.snapshot_dir)
    eng = engine_lib.InferenceEngine(config, *eng_model)
    memory = _load_memory(args, config)
    _warm(eng, config, scales=scales if msc else (1.0,), memory=memory,
          kinds=(("pyramid",) if msc
                 else ("probs",) if crf else ("predict",)))
    postprocessor = cli.crf_from_args(args) if crf else None
    color_map = vis.load_color_map(config.dataset.color_map_path)

    def _tail(probs, image0, base, oh, ow):
        """Host tail: prob download + resize + CRF + argmax + save —
        runs on the _AsyncSink pool, overlapped with the next image's
        device work (probs may be an async-download resolver from
        msc_predict_probs_device_async)."""
        if callable(probs):
            probs = probs()
        probs = transforms._resize_image(probs, oh, ow)
        if postprocessor is not None:
            rgb = cli.denormalize_image(image0, config)
            probs = postprocessor(rgb, probs.transpose(2, 0, 1))
            probs = probs.transpose(1, 2, 0)
        pred = probs.argmax(-1).astype(np.uint8)
        cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
        print(f"inference {base}", flush=True)

    batcher = None
    if not msc and not crf and getattr(config.tpu, "infer_batch", 1) > 1:
        def _save_batched(pred, base, oh, ow):
            pred = _resize_pred_to(pred, oh, ow)
            cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
            print(f"inference {base}", flush=True)

        batcher = _PredictBatcher(eng, memory, config.tpu.infer_batch,
                                  _save_batched)

    with _AsyncSink() as sink:
        for _, base, image0, _, _ in cli.iterate_test_images(
                config, args.data_dir, args.data_list):
            oh, ow = image0.shape[:2]
            image, _, _ = _maybe_resize_input(config, image0)
            if msc and not crf:
                # finish on device: resize-to-original + argmax inside
                # one bucketed program, download 1 byte/px instead of
                # C-channel fp16 probs (the dominant tunnel cost; see
                # msc.msc_predict_labels_device)
                pred = msc_lib.msc_predict_labels_device(
                    eng, image, memory, scales=scales, is_flip=True,
                    final_hw=(oh, ow))
                cli.save_semantic_pngs(pred, base, args.save_dir,
                                       color_map)
                print(f"inference {base}", flush=True)
            elif msc or crf:
                if msc:
                    probs = msc_lib.msc_predict_probs_device_async(
                        eng, image, memory, scales=scales, is_flip=True)
                else:
                    probs = eng.predict_topk_probs(image, *memory)
                sink.submit(_tail, probs, image0, base, oh, ow)
            elif batcher is not None:
                batcher.add(base, image, oh, ow)
            else:
                pred = eng.predict_semantic(image, *memory)
                pred = _resize_pred_to(pred, oh, ow)
                cli.save_semantic_pngs(pred, base, args.save_dir,
                                       color_map)
                print(f"inference {base}", flush=True)
        if batcher is not None:
            batcher.flush_all()


def run_softmax_inference(args, config, msc=False, crf=False,
                          scales=(0.5, 0.75, 1, 1.25, 1.5)):
    emb_model, evars, cls_model, cvars = cli.build_eval_models(
        config, args.snapshot_dir, with_classifier=True)
    eng = SoftmaxInferenceEngine(config, emb_model, evars, cls_model,
                                 cvars)
    _warm_softmax(eng, config, scales=scales if msc else (1.0,),
                  device_pyramid=msc)
    postprocessor = cli.crf_from_args(args) if crf else None
    color_map = vis.load_color_map(config.dataset.color_map_path)

    def _tail(probs, image0, base, oh, ow):
        if callable(probs):  # async-download resolver (msc path)
            probs = probs()
        probs = transforms._resize_image(probs, oh, ow)
        if postprocessor is not None:
            rgb = cli.denormalize_image(image0, config)
            probs = postprocessor(rgb, probs.transpose(2, 0, 1))
            probs = probs.transpose(1, 2, 0)
        pred = probs.argmax(-1).astype(np.uint8)
        cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
        print(f"softmax inference {base}", flush=True)

    with _AsyncSink() as sink:
        for _, base, image0, _, _ in cli.iterate_test_images(
                config, args.data_dir, args.data_list):
            oh, ow = image0.shape[:2]
            image, _, _ = _maybe_resize_input(config, image0)
            if msc and postprocessor is None:
                pred = msc_lib.msc_predict_labels_device(
                    eng, image, (), scales=scales, is_flip=True,
                    final_hw=(oh, ow))
                cli.save_semantic_pngs(pred, base, args.save_dir,
                                       color_map)
                print(f"softmax inference {base}", flush=True)
            else:
                if msc:
                    probs = msc_lib.msc_predict_probs_device_async(
                        eng, image, (), scales=scales, is_flip=True)
                else:
                    probs = eng.predict_probs(image)
                sink.submit(_tail, probs, image0, base, oh, ow)


# per-process LRU of compiled stride-8 affinity programs, keyed on
# the model/params identity and the exact (h, w): rebuilding the jit
# wrapper per image defeats jax's compile cache entirely (each image
# re-traced + re-compiled the whole R101 forward — observed ~49 s/image
# over the tunnel in the round-3 pipeline drill vs ~seconds warm). The
# unique-(h, w) count is bounded by the dataset's size spread (VOC: ~10
# dominant shapes). Bounded (advisor round-3): each closure pins the
# full param tree, so a long-lived process loading many snapshots must
# evict old entries or it accumulates whole param copies. NOTE: keys
# use id(evars) — callers must NOT mutate a params tree in place (load
# a new snapshot into a NEW pytree), or a stale program would be served.
_AFF8_CACHE = collections.OrderedDict()
_AFF8_CACHE_MAX = 64


def _stride8_affinity(config, emb_model, evars, image):
    """Flip-AVERAGED pixel affinity at the stride-8 grid
    (pseudo_camrw_crf.py:139-155: per flip, embed -> downsample /8 ->
    L2-normalize -> exp(5cos-5); the AFFINITIES are averaged, not the
    embeddings). Runs entirely on device; returns the [n, n] affinity
    (device array) with n = (h//8)*(w//8)."""
    from spml_tpu.models.spp import resize_bilinear
    h, w = image.shape[:2]
    img_pad = transforms.resize_with_pad(image, config.test.crop_size, 0.0)

    key = (id(emb_model), id(evars), h, w, tuple(config.test.crop_size))
    aff8 = _AFF8_CACHE.get(key)
    if aff8 is not None:
        _AFF8_CACHE.move_to_end(key)
    else:
        @jax.jit
        def aff8(x):
            def embed8(v, flip):
                v = v[:, :, ::-1] if flip else v
                emb, _ = emb_model.apply(evars, v, train=False,
                                         resize_as_input=True)
                emb = emb.astype(jnp.float32)[0]
                if flip:
                    emb = emb[:, ::-1]
                emb = emb[:h, :w]
                emb8 = resize_bilinear(emb[None], (h // 8, w // 8))[0]
                return common.normalize_embedding(emb8).reshape(
                    -1, emb8.shape[-1])

            aff = (randomwalk.pixel_affinity(embed8(x, False))
                   + randomwalk.pixel_affinity(embed8(x, True))) * 0.5
            return aff

        _AFF8_CACHE[key] = aff8
        while len(_AFF8_CACHE) > _AFF8_CACHE_MAX:
            _AFF8_CACHE.popitem(last=False)

    return aff8(jnp.asarray(img_pad[None]))


def _walk_scores(config, aff, scores_full, grid_hw):
    """Downsample scores to the stride-8 grid, random-walk over the
    (flip-averaged) affinity, upsample back."""
    from spml_tpu.models.spp import resize_bilinear
    c, h, w = scores_full.shape
    gh, gw = grid_hw
    scores8 = resize_bilinear(
        jnp.asarray(scores_full.transpose(1, 2, 0)[None]), (gh, gw))[0]
    walked = randomwalk.random_walk_from_affinity(
        aff, scores8.reshape(-1, c).T)
    walked = walked.reshape(c, gh, gw)
    out = np.asarray(resize_bilinear(
        walked.transpose(1, 2, 0)[None], (h, w)))[0]
    return out.transpose(2, 0, 1)


def run_pseudo_camrw_crf(args, config, bg_alpha=6.0, with_crf=True):
    """Tags: SEAM CAM + random walk + CRF -> pseudo labels
    (pseudo_camrw_crf.py)."""
    emb_model, evars = cli.build_eval_models(config, args.snapshot_dir)
    postprocessor = cli.crf_from_args(args) if with_crf else None
    color_map = vis.load_color_map(config.dataset.color_map_path)
    C = config.dataset.num_classes

    def _tail(walked, image, base):
        if postprocessor is not None:
            rgb = cli.denormalize_image(image, config)
            walked = postprocessor(rgb, np.ascontiguousarray(walked))
        pred = walked.argmax(0).astype(np.uint8)
        cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
        print(f"pseudo_camrw {base}", flush=True)

    with _AsyncSink() as sink:
        for _, base, image, sem, _ in cli.iterate_test_images(
                config, args.data_dir, args.data_list):
            h, w = image.shape[:2]
            cam = np.load(os.path.join(args.cam_dir,
                                       base.replace(".png", ".npy")),
                          allow_pickle=True).item()
            scores = randomwalk.cam_to_full_scores(cam, C, h, w, bg_alpha)
            aff = _stride8_affinity(config, emb_model, evars, image)
            walked = _walk_scores(config, aff, scores, (h // 8, w // 8))
            sink.submit(_tail, walked, image, base)


def run_pseudo_softmax(args, config, with_crf=False, with_walk=True,
                       scales=(0.75, 1.0)):
    """Softmax probs (flip/scale averaged), tag-masked, random walk,
    optional CRF (pseudo_softmaxrw_crf.py / pseudo_softmax.py)."""
    emb_model, evars, cls_model, cvars = cli.build_eval_models(
        config, args.snapshot_dir, with_classifier=True)
    eng = SoftmaxInferenceEngine(config, emb_model, evars, cls_model,
                                 cvars)
    _warm_softmax(eng, config, scales=scales, device_pyramid=True)
    postprocessor = cli.crf_from_args(args) if with_crf else None
    color_map = vis.load_color_map(config.dataset.color_map_path)
    C = config.dataset.num_classes

    def _tail(probs, image, base):
        if postprocessor is not None:
            rgb = cli.denormalize_image(image, config)
            probs = postprocessor(rgb, np.ascontiguousarray(probs))
        pred = probs.argmax(0).astype(np.uint8)
        cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
        print(f"pseudo_softmax {base}", flush=True)

    with _AsyncSink() as sink:
        for _, base, image, sem, _ in cli.iterate_test_images(
                config, args.data_dir, args.data_list):
            h, w = image.shape[:2]
            probs = msc_lib.msc_predict_probs_device(
                eng, image, (), scales=scales, is_flip=True)
            probs = probs.transpose(2, 0, 1)  # [C, h, w]
            # mask to the image's tags and max-normalize
            # (pseudo_softmaxrw_crf.py:146-158)
            if sem is not None:
                tags = np.zeros(C, np.float32)
                uniq = np.unique(sem)
                tags[uniq[uniq < C]] = 1.0
                probs = probs * tags[:, None, None]
            probs = probs / np.maximum(
                probs.max(axis=(1, 2), keepdims=True), 1e-8)
            if with_walk:
                aff = _stride8_affinity(config, emb_model, evars, image)
                probs = _walk_scores(config, aff, probs, (h // 8, w // 8))
            sink.submit(_tail, probs, image, base)


def run_pseudo_knn(args, config, scales=(0.5, 1.0, 1.5, 2.0),
                   prob_floor=0.15, with_crf=True):
    """KNN-retrieval pseudo labels with tag masking + probability floor +
    CRF (pseudo_inference_crf_msc.py:135-292)."""
    eng_model = cli.build_eval_models(config, args.snapshot_dir)
    eng = engine_lib.InferenceEngine(config, *eng_model)
    memory = _load_memory(args, config)
    _warm(eng, config, scales=scales, memory=memory,
          kinds=("pyramid",))
    postprocessor = cli.crf_from_args(args) if with_crf else None
    color_map = vis.load_color_map(config.dataset.color_map_path)
    C = config.dataset.num_classes
    ignore = config.dataset.semantic_ignore_index

    def _tail(probs, image, sem, base):
        if callable(probs):  # async-download resolver: [h, w, C]
            probs = probs().transpose(2, 0, 1)
        if sem is not None:
            tags = np.zeros(C, np.float32)
            uniq = np.unique(sem)
            tags[uniq[uniq < C]] = 1.0
            probs = probs * tags[:, None, None]
        if postprocessor is not None:
            rgb = cli.denormalize_image(image, config)
            probs = postprocessor(rgb, np.ascontiguousarray(probs))
        pred = probs.argmax(0).astype(np.uint8)
        # low-confidence pixels -> ignore (prob_floor 0.15)
        pred = np.where(probs.max(0) < prob_floor, ignore, pred)
        pred = pred.astype(np.uint8)
        cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
        print(f"pseudo_knn {base}", flush=True)

    with _AsyncSink() as sink:
        for _, base, image, sem, _ in cli.iterate_test_images(
                config, args.data_dir, args.data_list):
            probs = msc_lib.msc_predict_probs_device_async(
                eng, image, memory, scales=scales, is_flip=True)
            sink.submit(_tail, probs, image, sem, base)


def run_benchmark(args, config, instance=False):
    """mIoU (or instance-weighted IoU) of save_dir/semantic_gray vs the
    ground-truth list (benchmark_by_mIoU.py / benchmark_by_instance.py)."""
    import PIL.Image

    from spml_tpu.utils import metrics
    C = config.dataset.num_classes
    meter = (metrics.InstanceWeightedIoU(C) if instance
             else metrics.MeanIoU(C))
    pred_dir = os.path.join(args.save_dir, "semantic_gray")
    for _, base, _, sem, inst in cli.iterate_test_images(
            config, args.data_dir, args.data_list):
        pred = np.array(PIL.Image.open(os.path.join(pred_dir, base)))
        if instance:
            meter.update(pred, sem, inst)
        else:
            meter.update(pred, sem)
    result = meter.result()
    print("class IoU:", np.round(result["class_iou"], 4).tolist())
    print(f"mean IoU: {result['mean_iou']:.4f}")
    if "pixel_accuracy" in result:
        print(f"pixel accuracy: {result['pixel_accuracy']:.4f}")
    return result


def run_pseudo_densepose(args, config, with_crf=True, bg_threshold=None):
    """DensePose point pseudo labels (pseudo_denseposerw_crf.py:95-243):
    cluster half-res embeddings WITH the point labels (ignore pixels
    remapped to an extra 'unknown' class so they cluster too), propagate
    labels to unlabeled segments by nearest labeled prototype (top-1,
    threshold -1), per-segment class distributions, stride-8 random walk,
    CRF, then re-mask the originally-ignored pixels."""
    import jax

    from spml_tpu.models.spp import resize_bilinear
    from spml_tpu.ops import kmeans, knn

    emb_model, evars = cli.build_eval_models(config, args.snapshot_dir)
    postprocessor = cli.crf_from_args(args) if with_crf else None
    color_map = vis.load_color_map(config.dataset.color_map_path)
    C = config.dataset.num_classes
    ignore = config.dataset.semantic_ignore_index
    k_clusters = tuple(config.network.kmeans_num_clusters)
    capacity = max(config.tpu.segment_capacity,
                   2 * int(np.prod(k_clusters)))

    @jax.jit
    def embed_half(x):
        emb, _ = emb_model.apply(evars, x, train=False,
                                 resize_as_input=True)
        emb = emb.astype(jnp.float32)
        return resize_bilinear(emb, (x.shape[1] // 2, x.shape[2] // 2))

    def propagate(emb_half, sem_half, inst_half):
        h2, w2 = emb_half.shape[:2]
        loc = jnp.broadcast_to(
            common.generate_location_features(h2, w2) - 0.5,
            (1, h2, w2, 2))
        segs, emb_flat, _ = kmeans.segment_batch(
            emb_half[None], loc, sem_half[None], inst_half[None],
            k_clusters, capacity, config.network.kmeans_iterations,
            ignore, label_cap=config.tpu.label_cap)
        seg_ids = segs.pixel_segment_ids[0]
        weights = segs.pixel_valid[0].astype(jnp.float32)
        protos = kmeans.calculate_prototypes_from_labels(
            emb_flat[0], seg_ids, capacity, weights)
        tags = knn.nearest_neighbor_multiset_labels(
            emb_flat[0], protos, segs.segment_semantic[0],
            jnp.zeros((h2 * w2,), jnp.int32),
            jnp.zeros((capacity,), jnp.int32), C,
            top_k=1, threshold=-1.0,
            prototype_mask=segs.segment_valid[0])
        s_probs = common.segment_mean(tags.astype(jnp.float32), seg_ids,
                                      capacity, weights)
        s_probs = s_probs / jnp.maximum(
            jnp.sum(s_probs, axis=1, keepdims=True), 1e-8)
        return jnp.take(s_probs, seg_ids, axis=0).reshape(h2, w2, C)

    propagate = jax.jit(propagate)

    sink = _AsyncSink()
    for _, base, image, sem, inst in cli.iterate_test_images(
            config, args.data_dir, args.data_list):
        h, w = image.shape[:2]
        lab_tags = np.unique(sem)
        lab_tags = lab_tags[lab_tags < C]
        present = np.zeros(C, bool)
        present[lab_tags] = True

        img_pad = transforms.resize_with_pad(image,
                                             config.test.crop_size, 0.0)
        emb_half = np.asarray(embed_half(jnp.asarray(img_pad[None])))[0]
        emb_half = emb_half[:h // 2, :w // 2]

        # point labels, 255 -> 'unknown' class C (kept in clustering)
        sem_u = sem.astype(np.int32).copy()
        sem_u[sem_u == ignore] = C
        sem_half = transforms._resize_nearest(sem_u, h // 2, w // 2)
        inst_half = transforms._resize_nearest(
            inst.astype(np.int32), h // 2, w // 2)

        probs_half = np.asarray(propagate(
            jnp.asarray(emb_half), jnp.asarray(sem_half),
            jnp.asarray(inst_half)))  # [h2, w2, C]

        # stride-8 scores, per-class max-normalized, absent classes zeroed
        gh, gw = h // 8, w // 8
        scores8 = np.asarray(resize_bilinear(
            jnp.asarray(probs_half[None]), (gh, gw)))[0].transpose(2, 0, 1)
        scores8 = scores8 / np.maximum(
            scores8.reshape(C, -1).max(1)[:, None, None], 1e-8)
        scores8[~present] = 0.0
        if bg_threshold is not None:
            scores8[0] = bg_threshold

        emb8 = emb_half / np.maximum(
            np.linalg.norm(emb_half, axis=-1, keepdims=True), 1e-12)
        emb8 = np.asarray(resize_bilinear(jnp.asarray(emb8[None]),
                                          (gh, gw)))[0]
        emb8 = emb8 / np.maximum(
            np.linalg.norm(emb8, axis=-1, keepdims=True), 1e-12)
        walked = np.asarray(randomwalk.random_walk(
            jnp.asarray(emb8.reshape(-1, emb8.shape[-1])),
            jnp.asarray(scores8.reshape(C, -1)))).reshape(C, gh, gw)

        full = transforms._resize_image(walked.transpose(1, 2, 0), h, w)
        full = np.ascontiguousarray(full.transpose(2, 0, 1))
        sink.submit(_densepose_tail, args, config, postprocessor,
                    color_map, full, image, sem, base)
    sink.close()


def _densepose_tail(args, config, postprocessor, color_map, full,
                    image, sem, base):
    """Host tail of run_pseudo_densepose (CRF + argmax + ignore re-mask
    + save), run on the _AsyncSink pool."""
    ignore = config.dataset.semantic_ignore_index
    if postprocessor is not None:
        rgb = cli.denormalize_image(image, config)
        full = postprocessor(rgb, full)
    pred = full.argmax(0).astype(np.uint8)
    pred[sem == ignore] = ignore
    cli.save_semantic_pngs(pred, base, args.save_dir, color_map)
    print(f"pseudo_densepose {base}", flush=True)
