"""Measure MSC KNN-inference per-image latency on the real TPU.

Round-1 weakness: predict_topk_probs did a host-side one-hot scatter per
pyramid member (10 members/image under MSC), syncing to host inside the
loop. Round 2 moved the top-20 probability computation into the jitted
cluster step. This measures the end-to-end per-image latency of the full
MSC pyramid (scales x flip, on-device stitch + probs, host transfer of
one [H,W,C] array per member) after shape-bucket warmup, and reports the
warmup cost separately.

Usage: python pyscripts/misc/msc_latency.py [--image_size 512] [--n 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--scales", default="0.5,0.75,1,1.25,1.5")
    ap.add_argument("--n", type=int, default=5, help="images to measure")
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()
    scales = [float(s) for s in args.scales.split(",")]

    import jax
    import jax.numpy as jnp

    from spml_tpu.config import load_config
    from spml_tpu.inference import engine as engine_lib
    from spml_tpu.inference import msc as msc_lib
    from spml_tpu.train import step as step_lib

    size = args.image_size
    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": args.dim,
                    "kmeans_num_clusters": [12, 12],
                    "kmeans_iterations": 10},
        "dataset": {"num_classes": 21},
        "test": {"image_size": size, "crop_size": [size, size],
                 "stride": [size, size]},
        "tpu": {"compute_dtype": "bfloat16", "segment_capacity": 512},
    })

    from spml_tpu.cli import enable_compilation_cache
    enable_compilation_cache(cfg)

    emb_model, _ = step_lib.build_models(cfg)
    evars = emb_model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    eng = engine_lib.InferenceEngine(cfg, emb_model, evars)

    rng = np.random.RandomState(0)
    n_mem = 4096
    memory = (jnp.asarray(rng.randn(n_mem, args.dim), jnp.float32),
              jnp.asarray(rng.randint(0, 21, (n_mem,)), jnp.int32),
              jnp.ones((n_mem,), bool))

    t0 = time.time()
    warmed = eng.warmup(max_hw=int(np.ceil(size * max(scales))),
                        memory=memory, with_probs=True,
                        device_pyramid=True)
    warmup_s = time.time() - t0
    print(f"warmup: {len(warmed)} buckets in {warmup_s:.1f}s", flush=True)

    # distinct aspect ratios (first pass pays the per-exact-shape eager
    # op compiles over the tunnel; the repeat pass is steady state —
    # what a dataset run sees after its first epoch over the shapes, or
    # from image one with the persistent compilation cache primed)
    sizes = [(size, size), (size * 3 // 4, size), (size, size * 3 // 4),
             (size * 2 // 3, size), (size // 2, size)][:args.n]
    first, repeat = [], []
    for phase, times in (("first", first), ("repeat", repeat)):
        for i, (h, w) in enumerate(sizes):
            img = rng.randn(h, w, 3).astype(np.float32)
            t0 = time.time()
            probs = msc_lib.msc_predict_probs_device(
                eng, img, memory, scales=scales, is_flip=True)
            dt = time.time() - t0
            assert probs.shape == (h, w, 21) and np.isfinite(probs).all()
            times.append(dt)
            print(f"{phase} image {i} {h}x{w}: {dt:.2f}s", flush=True)

    # non-CRF path: device resize+argmax, uint8 label download
    # (msc_predict_labels_device) — the prob download above is the
    # dominant steady-state cost over the ~20-30 MB/s tunnel
    lab_first, lab_repeat = [], []
    for phase, times in (("lab_first", lab_first),
                         ("lab_repeat", lab_repeat)):
        for i, (h, w) in enumerate(sizes):
            img = rng.randn(h, w, 3).astype(np.float32)
            t0 = time.time()
            pred = msc_lib.msc_predict_labels_device(
                eng, img, memory, scales=scales, is_flip=True)
            dt = time.time() - t0
            assert pred.shape == (h, w) and pred.dtype == np.uint8
            times.append(dt)
            print(f"{phase} image {i} {h}x{w}: {dt:.2f}s", flush=True)

    # CRF-path pipelined throughput: the runner submits the ASYNC prob
    # download to the _AsyncSink pool (msc_predict_probs_device_async),
    # so image i's ~11 MB fp16 transfer resolves on a worker while the
    # main loop prepares and dispatches image i+1. Measure N images
    # back-to-back, blocking vs pipelined (no CRF tail — isolates the
    # transfer overlap; the CRF itself runs on the same pool in real
    # paths and is benchmarked in profile_crf.py).
    import concurrent.futures
    pipe_sizes = [sizes[i % len(sizes)] for i in range(2 * len(sizes))]

    t0 = time.time()
    for h, w in pipe_sizes:
        img = rng.randn(h, w, 3).astype(np.float32)
        msc_lib.msc_predict_probs_device(
            eng, img, memory, scales=scales, is_flip=True)
    blocking_s = (time.time() - t0) / len(pipe_sizes)

    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        futs = []
        for h, w in pipe_sizes:
            img = rng.randn(h, w, 3).astype(np.float32)
            resolve = msc_lib.msc_predict_probs_device_async(
                eng, img, memory, scales=scales, is_flip=True)
            futs.append(pool.submit(resolve))
        for f in futs:
            assert np.isfinite(f.result()).all()
    pipelined_s = (time.time() - t0) / len(pipe_sizes)
    print(f"crf-path per image: blocking {blocking_s:.2f}s, "
          f"pipelined {pipelined_s:.2f}s", flush=True)

    out = {"image_size": size, "scales": scales,
           "pyramid_members": 2 * len(scales),
           "warmup_buckets": len(warmed), "warmup_s": round(warmup_s, 1),
           "first_pass_median_s": round(float(np.median(first)), 2),
           "steady_state_median_s": round(float(np.median(repeat)), 2),
           "labels_first_pass_median_s":
               round(float(np.median(lab_first)), 2),
           "labels_steady_state_median_s":
               round(float(np.median(lab_repeat)), 2),
           "crf_path_blocking_s_per_image": round(blocking_s, 2),
           "crf_path_pipelined_s_per_image": round(pipelined_s, 2)}
    print(json.dumps(out))
    with open(os.path.join(ROOT, "MSC_LATENCY.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
