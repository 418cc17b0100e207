"""SPMD partitioning overhead on a virtual CPU mesh.

Real multi-chip hardware is not available in this image (one v5e chip
via tunnel), so this measures what CAN be measured without it: the cost
the GSPMD partitioning adds to the train step when the same global batch
is sharded over 1/2/4/8 virtual CPU devices on one host. All devices
share one physical core, so wall time per step should stay ~constant if
the partitioned program (collectives for sync-BN, prototype all-gather,
loss reduction) adds no redundant work — the reported overhead_vs_1dev
is the multi-chip tax, not a speedup claim.

Writes SCALING.json at the repo root.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp

    from spml_tpu.config import load_config
    from spml_tpu.parallel import mesh as mesh_lib
    from spml_tpu.train import step as step_lib

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--global-batch", type=int, default=16,
                    help="16 (2 imgs/device at 8-way) is the primary "
                         "measurement: at 1 img/device the step is "
                         "dominated by per-device fixed costs under "
                         "host emulation and the 8-way row is noisy "
                         "(36-69 s observed across re-measures)")
    args = ap.parse_args()
    B_global, crop = args.global_batch, 128
    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": 64,
                    "kmeans_num_clusters": [6, 6],
                    "kmeans_iterations": 10},
        "dataset": {"num_classes": 21},
        "train": {"batch_size": 1, "crop_size": [crop, crop],
                  "memory_bank_size": 2, "max_iteration": 30000,
                  "warmup_iteration": 100, "base_lr": 3e-3},
        "tpu": {"segment_capacity": 64, "compute_dtype": "float32",
                "use_fused_loss": False},
    })

    rng = np.random.RandomState(0)
    data_np = {
        "image": rng.randn(B_global, crop, crop, 3).astype(np.float32),
        "semantic_label": rng.randint(
            0, 21, (B_global, crop, crop)).astype(np.int32),
        "instance_label": rng.randint(
            0, 64, (B_global, crop, crop)).astype(np.int32),
        "semantic_tag": (rng.rand(B_global, 256) > 0.8).astype(np.int32),
    }

    rows = []
    for n_dev in (1, 2, 4, 8):
        cfg.train.batch_size = B_global // n_dev
        mesh = mesh_lib.make_mesh(num_devices=n_dev)
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                    jnp.zeros((B_global, crop, crop, 3)))
        state = mesh_lib.device_put_replicated(state, mesh)
        data = mesh_lib.device_put_batch(
            {k: jnp.asarray(v) for k, v in data_np.items()}, mesh)
        train_step = mesh_lib.shard_train_step(
            step_lib.make_train_step(cfg), mesh)
        t0 = time.perf_counter()
        for _ in range(2):
            state, metrics = train_step(state, data)
        jax.block_until_ready(metrics)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(float(metrics["loss"]))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = train_step(state, data)
        jax.block_until_ready(metrics)
        ms = (time.perf_counter() - t0) / iters * 1000
        rows.append({"devices": n_dev, "step_ms": round(ms, 1),
                     "compile_s": round(compile_s, 1),
                     "loss": round(float(metrics["loss"]), 4)})
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["step_ms"]
    for r in rows:
        r["overhead_vs_1dev"] = round(r["step_ms"] / base - 1.0, 3)
    out = {"global_batch": B_global, "crop": crop,
           "note": ("virtual devices share ONE physical core: step_ms "
                    "is expected ~flat; overhead_vs_1dev isolates the "
                    "GSPMD collective/partitioning tax on the identical "
                    "global workload. Measured at 2 imgs/device for the "
                    "8-way row; the earlier 1-img/device measurement is "
                    "dominated by per-device fixed costs under host "
                    "emulation and fluctuated 0.25-1.7 across "
                    "re-measures (see git history of this artifact)"),
           "rows": rows}
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
