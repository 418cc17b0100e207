"""Break the MSC per-image latency into components on the real TPU.

MSC_LATENCY.json says ~2.3 s/image steady state for the 10-member
pyramid at image_size 512. Per member the work is: sliding-window
embed (1-4 patch forwards) -> stitched k-means clustering (144
clusters over the padded bucket) -> prototype build -> top-20 KNN vs
the memory bank -> per-pixel probs -> bucket-static resize/accumulate.
This times each component separately (chained: every iteration's input
depends on the previous output scalar) at the two buckets a 512-size
pyramid reaches (512^2 and 1024^2) so the optimization target is
measured, not guessed.

Usage: python pyscripts/misc/msc_profile.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from spml_tpu.config import load_config
    from spml_tpu.inference import engine as engine_lib
    from spml_tpu.inference import msc as msc_lib
    from spml_tpu.train import step as step_lib

    size = 512
    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": 64,
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
    memory = (jnp.asarray(rng.randn(n_mem, 64), jnp.float32),
              jnp.asarray(rng.randint(0, 21, (n_mem,)), jnp.int32),
              jnp.ones((n_mem,), bool))

    def timeit(fn, chain_in, *args, iters=8, warmup=2):
        """fn(carry, *args) -> scalar; chained timing. Big arrays must
        be passed through *args (closure-captured device arrays get
        embedded as HLO constants — a 1024^2 map is 256 MB and
        overflows the compile tunnel's request limit)."""
        carry = chain_in
        for _ in range(warmup):
            carry = fn(carry, *args)
        float(carry)
        t0 = time.perf_counter()
        carry = chain_in
        for _ in range(iters):
            carry = fn(carry, *args)
        float(carry)
        return (time.perf_counter() - t0) / iters * 1000

    results = {}

    # 1) patch forward (512^2, batch 1)
    patch = jnp.asarray(rng.randn(1, size, size, 3), jnp.float32)

    @jax.jit
    def embed_step(carry, patch):
        emb = eng._embed_patch_impl(patch + carry * 1e-30)
        return jnp.sum(emb[..., 0]) * 1e-20

    results["embed_patch_512_ms"] = round(
        timeit(embed_step, jnp.zeros(()), patch), 1)
    print("embed_patch_512_ms", results["embed_patch_512_ms"], flush=True)

    # 2) cluster+probs at each bucket
    from spml_tpu.ops import common, kmeans, knn  # noqa: F401

    for hb in (512, 1024):
        emb_map = common.normalize_embedding(
            jnp.asarray(rng.randn(hb, hb, 64), jnp.float32))
        sem = jnp.zeros((hb, hb), jnp.int32)
        inst = jnp.zeros((hb, hb), jnp.int32)

        @functools.partial(jax.jit, static_argnames=())
        def probs_step(carry, emb_map, sem, inst):
            probs = eng._cluster_probs_impl(
                emb_map + carry * 1e-30, sem, inst, *memory,
                num_classes=21)
            return jnp.sum(probs[..., 0]) * 1e-20

        results[f"cluster_probs_{hb}_ms"] = round(
            timeit(probs_step, jnp.zeros(()), emb_map, sem, inst), 1)
        print(f"cluster_probs_{hb}_ms", results[f"cluster_probs_{hb}_ms"],
              flush=True)

        # k-means alone (the clustering inside)
        loc = jnp.broadcast_to(
            common.generate_location_features(hb, hb) - 0.5,
            (1, hb, hb, 2))

        @jax.jit
        def kmeans_step(carry, emb_map, sem, inst, loc):
            segs, emb_flat, _ = kmeans.segment_batch(
                emb_map[None] + carry * 1e-30, loc, sem[None], inst[None],
                (12, 12), 144, 10, 255, label_cap=cfg.tpu.label_cap)
            return (jnp.sum(segs.pixel_segment_ids)
                    .astype(jnp.float32) * 1e-20 + carry * 0.0)

        results[f"kmeans_{hb}_ms"] = round(
            timeit(kmeans_step, jnp.zeros(()), emb_map, sem, inst, loc), 1)
        print(f"kmeans_{hb}_ms", results[f"kmeans_{hb}_ms"], flush=True)

        @jax.jit
        def kmeans_fast_step(carry, emb_map, sem, loc):
            segs, _ = kmeans.segment_batch_single_group(
                emb_map[None] + carry * 1e-30, loc, sem[None],
                (12, 12), 10, 255)
            return (jnp.sum(segs.pixel_segment_ids)
                    .astype(jnp.float32) * 1e-20 + carry * 0.0)

        results[f"kmeans_fast_{hb}_ms"] = round(
            timeit(kmeans_fast_step, jnp.zeros(()), emb_map, sem, loc), 1)
        print(f"kmeans_fast_{hb}_ms", results[f"kmeans_fast_{hb}_ms"],
              flush=True)

        # resize/accumulate (one member into the base bucket)
        probs = jnp.zeros((hb, hb, 21), jnp.float32)
        acc0 = jnp.zeros((512, 512, 21), jnp.float32)
        hw = jnp.asarray([480, 480], jnp.int32)

        def resize_step(carry, probs, acc0):
            acc = msc_lib._resize_accumulate(
                acc0 + carry * 1e-30, probs, hw, hw,
                out_bucket=(512, 512), flip=False)
            return jnp.sum(acc[..., 0]) * 1e-20

        results[f"resize_acc_{hb}to512_ms"] = round(
            timeit(jax.jit(resize_step), jnp.zeros(()), probs, acc0), 1)
        print(f"resize_acc_{hb}to512_ms",
              results[f"resize_acc_{hb}to512_ms"], flush=True)

    print(json.dumps(results, indent=1))
    with open(os.path.join(ROOT, "MSC_PROFILE.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
