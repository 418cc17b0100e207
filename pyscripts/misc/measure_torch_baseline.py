"""Measure the reference PyTorch SPML train step locally.

BASELINE.md requires the >=5x-throughput target to be judged "against a
locally-run PyTorch baseline or recorded as reference-absent". No GPU
exists in this image, so this measures the reference pipeline (its own
code imported from /root/reference: ResnetDeeplab + SegsortSoftmax +
segment_by_kmeans + SGD) on CPU at the headline scribble configuration
(resnet-101 deeplab, dim 64, crop 512, batch 4 — train_spml_scribble.sh:
14-44), plus OUR train step on the same CPU for a hardware-neutral
framework-vs-framework number.

Writes TORCH_BASELINE.json at the repo root:
  {"torch_cpu_imgs_per_sec": .., "ours_cpu_imgs_per_sec": ..,
   "config": {...}, "caveat": "..."}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)

import pyscripts.misc.lockstep_parity as lp  # noqa: E402


HEADLINE = dict(
    batch=4, crop=512, dim=64, num_classes=21, ignore=255,
    kmeans_clusters=(6, 6), kmeans_iterations=10,
    base_lr=3e-3, weight_decay=5e-4, momentum=0.9,
    sem_ann_kappa=6.0, sem_ann_w=1.0,
    sem_occ_kappa=12.0, sem_occ_w=0.5,
    img_sim_kappa=16.0, img_sim_w=0.1,
    memory_bank_size=2,
)


def measure_torch(batches, warmup=1):
    lp.SCEN.update(HEADLINE)
    lp._install_reference()
    import torch
    torch.manual_seed(0)
    from spml.models.embeddings.resnet_deeplab import resnet_101_deeplab
    from spml.models.predictions.segsort_softmax import segsort

    cfg = lp._reference_config()
    emb = resnet_101_deeplab(cfg)
    pred = segsort(cfg)
    emb.train()
    pred.train()

    t_per_iter = []
    n = len(batches)

    def run(bs):
        lp.run_reference(emb, pred, cfg, bs)

    run(batches[:warmup])
    for b in batches[warmup:]:
        t0 = time.time()
        run([b])
        t_per_iter.append(time.time() - t0)
    return float(np.median(t_per_iter)), n - warmup


def measure_ours_cpu(batches, warmup=1):
    lp.SCEN.update(HEADLINE)
    import jax
    import jax.numpy as jnp

    from spml_tpu.train import step as step_lib

    cfg = lp._our_config()
    cfg.network.backbone_types = "panoptic_deeplab_101"
    cfg.train.max_iteration = len(batches)
    cfg.tpu.segment_capacity = 128
    cfg.tpu.use_fused_loss = False  # Pallas interpret mode is slow on CPU
    s = lp.SCEN
    state = step_lib.init_state(
        cfg, jax.random.PRNGKey(0),
        jnp.zeros((s["batch"], s["crop"], s["crop"], 3)))
    step_fn = jax.jit(step_lib.make_train_step(cfg))
    t_per_iter = []
    for i, b in enumerate(batches):
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        t0 = time.time()
        state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics["loss"])
        if i >= warmup:
            t_per_iter.append(time.time() - t0)
    return float(np.median(t_per_iter))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=4,
                        help="iterations incl. 1 warmup")
    parser.add_argument("--skip_ours", action="store_true")
    parser.add_argument("--out",
                        default=os.path.join(ROOT, "TORCH_BASELINE.json"))
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    lp.SCEN.update(HEADLINE)
    batches = lp.make_batches(args.iters)

    print("measuring reference torch pipeline (CPU) ...", flush=True)
    t_ref, n = measure_torch(batches)
    torch_ips = HEADLINE["batch"] / t_ref
    print(f"torch CPU: {t_ref:.2f} s/iter -> {torch_ips:.3f} imgs/s")

    ours_ips = None
    if not args.skip_ours:
        print("measuring our train step (CPU, same shapes) ...", flush=True)
        t_ours = measure_ours_cpu(batches)
        ours_ips = HEADLINE["batch"] / t_ours
        print(f"ours CPU:  {t_ours:.2f} s/iter -> {ours_ips:.3f} imgs/s")

    result = {
        "torch_cpu_imgs_per_sec": round(torch_ips, 4),
        "ours_cpu_imgs_per_sec": (round(ours_ips, 4)
                                  if ours_ips is not None else None),
        "iters_measured": n,
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in HEADLINE.items()},
        "caveat": ("No GPU exists in this environment; the reference "
                   "publishes no throughput numbers. This measures the "
                   "reference's own code on CPU at the headline scribble "
                   "config (r101 deeplab, dim 64, crop 512, batch 4). "
                   "bench.py reports vs_baseline as TPU-chip imgs/s over "
                   "this torch-CPU imgs/s — a cross-hardware ratio."),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
