"""Sweep train-step batch sizes on the real TPU chip and print imgs/s.

Exploration harness for the single-chip MFU work (VERDICT round-1 item
2): runs the flagship scribble config (same as bench.py) at several
per-chip batch sizes with the fused Pallas loss kernels and reports
throughput per config. Optionally captures a jax.profiler trace for the
best batch.

Usage: python pyscripts/misc/tpu_batch_sweep.py [--batches 8,16] [--trace DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def run_one(batch, crop, fused, trace_dir=None, iters=10, blobby=False):
    import jax
    import jax.numpy as jnp

    from spml_tpu.cli import enable_compilation_cache
    from spml_tpu.config import load_config
    from spml_tpu.parallel import mesh as mesh_lib
    from spml_tpu.train import step as step_lib

    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": 64,
                    "kmeans_num_clusters": [6, 6],
                    "kmeans_iterations": 10},
        "dataset": {"num_classes": 21},
        "train": {"batch_size": batch, "crop_size": [crop, crop],
                  "memory_bank_size": 2, "max_iteration": 30000,
                  "warmup_iteration": 100, "base_lr": 3e-3,
                  "sem_ann_concentration": 6.0,
                  "sem_occ_concentration": 12.0,
                  "img_sim_concentration": 16.0,
                  "sem_ann_loss_weight": 1.0,
                  "sem_occ_loss_weight": 0.5,
                  "img_sim_loss_weight": 0.1},
        "tpu": {"segment_capacity": 256, "compute_dtype": "bfloat16",
                "use_fused_loss": fused},
    })

    enable_compilation_cache(cfg)
    mesh = mesh_lib.make_mesh(num_devices=1)
    rng = np.random.RandomState(0)
    if blobby:
        # the bench.py default distribution (~17% prototype fill) where
        # valid-prototype compaction shrinks the loss sweep
        import pyscripts.misc.lockstep_parity as lp
        lp.SCEN.update(batch=batch, crop=crop, num_classes=21,
                       ignore=255)
        b = lp.make_batches(1)[0]
        data = {k: jnp.asarray(v) for k, v in b.items()}
    else:
        data = {
            "image": jnp.asarray(rng.randn(batch, crop, crop, 3),
                                 jnp.float32),
            "semantic_label": jnp.asarray(
                rng.randint(0, 21, (batch, crop, crop)), jnp.int32),
            "instance_label": jnp.asarray(
                rng.randint(0, 64, (batch, crop, crop)), jnp.int32),
            "semantic_tag": jnp.asarray(rng.rand(batch, 256) > 0.8,
                                        jnp.int32),
        }

    state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                jnp.zeros((batch, crop, crop, 3)))
    state = mesh_lib.device_put_replicated(state, mesh)
    data = mesh_lib.device_put_batch(data, mesh)
    train_step = mesh_lib.shard_train_step(
        step_lib.make_train_step(cfg), mesh)

    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = train_step(state, data)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"])), "non-finite loss"

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, data)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()

    return {"batch": batch, "fused": fused,
            "imgs_per_sec": round(batch * iters / dt, 2),
            "ms_per_img": round(dt / iters / batch * 1000, 2),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="capture profiler trace for the LAST batch")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blobby", action="store_true",
                    help="bench.py's ~17%%-fill label distribution")
    args = ap.parse_args()

    batches = [int(b) for b in args.batches.split(",")]
    results = []
    for i, b in enumerate(batches):
        trace = args.trace if i == len(batches) - 1 else None
        r = run_one(b, args.crop, not args.no_fused, trace, args.iters,
                    blobby=args.blobby)
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["imgs_per_sec"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
