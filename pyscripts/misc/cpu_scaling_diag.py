"""Diagnose the SCALING.json v2 anomaly (2-dev 99.7 s vs 1-dev 57.3 s
on the SAME global-16 workload).

Attribution method: on this 1-physical-core host an n-device step
serializes to ~ n x (single-device program at batch B/n) + GSPMD tax
(collectives + partitioning overhead). So measure the SINGLE-device
step at per-device batches 16/8/4/2 — no mesh, no collectives, the
pure local program — and compare n x T_local(B/n) against the measured
n-device rows from SCALING.json. If the predicted time already
reproduces the anomaly, the cause is the local program's batch-size
regime on CPU (conv algorithm/cache behavior at that batch), not the
partitioning; the residual is the actual collective/partitioning tax.

Writes SCALING_DIAG.json at the repo root.
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
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp

    from spml_tpu.config import load_config
    from spml_tpu.parallel import mesh as mesh_lib
    from spml_tpu.train import step as step_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    crop = 128
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

    def make_data(b):
        return {
            "image": rng.randn(b, crop, crop, 3).astype(np.float32),
            "semantic_label": rng.randint(
                0, 21, (b, crop, crop)).astype(np.int32),
            "instance_label": rng.randint(
                0, 64, (b, crop, crop)).astype(np.int32),
            "semantic_tag": (rng.rand(b, 256) > 0.8).astype(np.int32),
        }

    def measure_local(b):
        """Single-device step at batch b: identical config path as
        cpu_mesh_scaling.py's measure() but mesh=(data=1) so the
        program carries no cross-device collectives."""
        cfg.train.batch_size = b
        mesh = mesh_lib.make_mesh(num_devices=1)
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                    jnp.zeros((b, crop, crop, 3)))
        state = mesh_lib.device_put_replicated(state, mesh)
        data = mesh_lib.device_put_batch(
            {k: jnp.asarray(v) for k, v in make_data(b).items()}, mesh)
        train_step = mesh_lib.shard_train_step(
            step_lib.make_train_step(cfg), mesh)
        t0 = time.perf_counter()
        for _ in range(2):
            state, metrics = train_step(state, data)
        jax.block_until_ready(metrics)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(float(metrics["loss"]))
        rep_ms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, metrics = train_step(state, data)
            jax.block_until_ready(metrics)
            rep_ms.append((time.perf_counter() - t0) * 1000)
        return {"step_ms": round(float(np.median(rep_ms)), 1),
                "rep_spread_ms": [round(x, 1) for x in sorted(rep_ms)],
                "compile_s": round(compile_s, 1)}

    locals_ = {}
    for b in (16, 8, 4, 2):
        locals_[b] = {"per_device_batch": b, **measure_local(b)}
        print(json.dumps(locals_[b]), flush=True)

    # attribute against the v2 mesh rows
    scaling_path = os.path.join(ROOT, "SCALING.json")
    attribution = []
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            v2 = json.load(f)
        for row in v2.get("rows", []):
            if "space" in row["mesh"]:
                continue
            n, b = row["devices"], row["imgs_per_device"]
            if b not in locals_:
                continue
            predicted = n * locals_[b]["step_ms"]
            attribution.append({
                "mesh": row["mesh"],
                "measured_step_ms": row["step_ms"],
                "predicted_serialized_ms": round(predicted, 1),
                "n_x_local": f"{n} x T_local(batch {b})",
                "gspmd_tax_ms": round(row["step_ms"] - predicted, 1),
                "gspmd_tax_frac": round(
                    row["step_ms"] / predicted - 1.0, 3),
            })
            print(json.dumps(attribution[-1]), flush=True)

    out = {"crop": crop,
           "protocol": (f"single-device (no mesh/collectives) step at "
                        f"per-device batches 16/8/4/2, median of "
                        f"{args.reps} reps, exclusive-priority host"),
           "local_rows": [locals_[b] for b in (16, 8, 4, 2)],
           "attribution_vs_SCALING_rows": attribution}
    with open(os.path.join(ROOT, "SCALING_DIAG.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_DIAG.json")


if __name__ == "__main__":
    main()
