"""Component-level timing of the SPML train step on the real TPU chip.

Times each piece of the flagship step in isolation (embedding forward,
forward+backward, k-means clustering, fused joint loss fwd/bwd, CE head
path, full step) so optimization effort lands on the real bottleneck.

Usage: python pyscripts/misc/tpu_component_profile.py [--batch 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spml_tpu.config import load_config
    from spml_tpu.models.spp import resize_bilinear
    from spml_tpu.ops import common, kmeans
    from spml_tpu.train import step as step_lib

    B, crop = args.batch, args.crop
    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": 64,
                    "kmeans_num_clusters": [6, 6],
                    "kmeans_iterations": 10},
        "dataset": {"num_classes": 21},
        "train": {"batch_size": B, "crop_size": [crop, crop],
                  "memory_bank_size": 2, "max_iteration": 30000,
                  "warmup_iteration": 100, "base_lr": 3e-3},
        "tpu": {"segment_capacity": 256, "compute_dtype": "bfloat16",
                "use_fused_loss": True},
    })

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, crop, crop, 3), jnp.float32)
    sem_full = jnp.asarray(rng.randint(0, 21, (B, crop, crop)), jnp.int32)
    data = {
        "image": images,
        "semantic_label": sem_full,
        "instance_label": jnp.asarray(
            rng.randint(0, 64, (B, crop, crop)), jnp.int32),
        "semantic_tag": jnp.asarray(rng.rand(B, 256) > 0.8, jnp.int32),
    }

    emb_model, cls_model = step_lib.build_models(cfg)
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                jnp.zeros((B, crop, crop, 3)))
    report = {}

    # 1) embedding forward
    @jax.jit
    def fwd(params, stats, x):
        (emb, loc), _ = emb_model.apply(
            {"params": params["embedding"], "batch_stats": stats["embedding"]},
            x, train=True, mutable=["batch_stats"])
        return emb, loc
    report["emb_forward"] = timeit(fwd, state.params, state.batch_stats,
                                   images)
    emb, loc = fwd(state.params, state.batch_stats, images)

    # 2) embedding forward+backward (sum loss)
    @jax.jit
    def fwdbwd(params, stats, x):
        def f(p):
            (e, _), _ = emb_model.apply(
                {"params": p["embedding"], "batch_stats": stats["embedding"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(e.astype(jnp.float32) ** 2)
        return jax.grad(f)(params)
    report["emb_fwd_bwd"] = timeit(fwdbwd, state.params, state.batch_stats,
                                   images)

    # 3) k-means clustering (stop-gradient path)
    h, w = emb.shape[1], emb.shape[2]
    sem = common.resize_labels(sem_full, (h, w))
    inst = common.resize_labels(data["instance_label"], (h, w))

    @jax.jit
    def cluster(e, l, s, i):
        return kmeans.segment_batch(e, l, s, i, (6, 6), 256, 10, 255,
                                    label_cap=256)
    report["kmeans_cluster"] = timeit(cluster, emb, loc, sem, inst)
    segs, _, _ = cluster(emb, loc, sem, inst)

    # 4) fused joint loss forward and forward+backward
    from spml_tpu.ops.pallas.segsort_loss import fused_joint_losses
    N = h * w
    D = emb.shape[-1]
    P = 256
    emb_flat = common.normalize_embedding(
        emb.astype(jnp.float32)).reshape(B * N, D)
    n_protos = B * P * 3  # current + memory bank 2
    protos = common.normalize_embedding(
        jnp.asarray(rng.randn(n_protos, D), jnp.float32))
    proto_sem = jnp.asarray(rng.randint(0, 21, (n_protos,)), jnp.int32)
    proto_tag = jnp.asarray(rng.rand(n_protos, 20) > 0.8, jnp.int32)
    pix_sem = sem.reshape(-1)
    pix_own = (segs.pixel_segment_ids
               + jnp.arange(B, dtype=jnp.int32)[:, None] * P).reshape(-1)
    pix_tag = jnp.repeat(data["semantic_tag"][:, 1:21], N, axis=0)
    pix_mask = segs.pixel_valid.reshape(-1)
    proto_mask = jnp.ones((n_protos,), bool)

    @jax.jit
    def loss_fwd(e, p):
        a, o = fused_joint_losses(e, pix_sem, pix_own, pix_tag, p,
                                  proto_sem, proto_tag, 6.0, 12.0,
                                  pix_mask, pix_mask, proto_mask,
                                  reduction="none")
        return jnp.sum(a) + jnp.sum(o)
    report["joint_loss_fwd"] = timeit(loss_fwd, emb_flat, protos)

    @jax.jit
    def loss_fwdbwd(e, p):
        return jax.grad(lambda ee, pp: loss_fwd(ee, pp),
                        argnums=(0, 1))(e, p)
    report["joint_loss_fwd_bwd"] = timeit(loss_fwdbwd, emb_flat, protos)

    # 5) CE head path (classifier + 4x upsample + one-hot CE) fwd+bwd
    @jax.jit
    def ce_path(params, stats, e, labels, key):
        def f(p):
            cls_in = jax.lax.stop_gradient(
                common.normalize_embedding(e.astype(jnp.float32)))
            logits, _ = cls_model.apply(
                {"params": p["prediction"],
                 "batch_stats": stats["prediction"]},
                cls_in, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            lu = resize_bilinear(logits, (crop, crop))
            return step_lib._cross_entropy(lu, labels, 21, 255, B)
        return jax.grad(f)(params)
    report["ce_path_fwd_bwd"] = timeit(
        ce_path, state.params, state.batch_stats, emb, sem_full,
        jax.random.PRNGKey(1))

    # 6) full train step
    from spml_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(num_devices=1)
    st = mesh_lib.device_put_replicated(state, mesh)
    dt = mesh_lib.device_put_batch(data, mesh)
    train_step = mesh_lib.shard_train_step(step_lib.make_train_step(cfg),
                                           mesh)
    def full(s, d):
        s2, m = train_step(s, d)
        return m
    # donation: rebuild state each call is wrong; time with a loop instead
    for _ in range(2):
        st, m = train_step(st, dt)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        st, m = train_step(st, dt)
    jax.block_until_ready(m)
    report["full_step"] = (time.perf_counter() - t0) / iters * 1000

    report = {k: round(v, 2) for k, v in report.items()}
    report["batch"] = B
    report["imgs_per_sec"] = round(B / (report["full_step"] / 1000), 2)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
