"""Diagnose the SCALING.json v2 anomaly (2-dev 99.7 s vs 1-dev 57.3 s
on the SAME global-16 workload).

Attribution method: on this 1-physical-core host an n-device step
serializes to ~ n x (single-device program at batch B/n) + GSPMD tax
(collectives + partitioning + the sharded loss's retained global-batch
prototype coupling). Measure, IN THE SAME SESSION:
  1. the single-device step at per-device batches 16/8/4/2 (a
     (data=1) mesh — no cross-device collectives, the pure local
     program), and
  2. the n-device mesh rows at the same global batch (--mesh-devs).
Then attribute: tax(n) = T_mesh(n) - n x T_local(B/n).

Same-session matters: absolute CPU step times drift 30-40% across
boots/sessions (cache and host state) — the first run of this script
attributed against the v2 rows recorded in an earlier session and got
a NEGATIVE 1-dev tax (today's T_local(16) = 80.6 s vs v2's 57.3 s for
the identical program), which is measurement drift, not physics.

Two structural facts the attribution must respect:
  - T_local is superlinear in batch (80.6 s at 16 vs 2x26.9 s at 8):
    the segsort loss does O(B^2) prototype-pair work (prototype
    capacity x memory bank both scale with B), so halving the
    per-device batch more than halves the per-device step.
  - sharding does NOT shrink the loss's global coupling: prototypes
    are all-gathered across devices (parallel/mesh.py), so each
    device's loss term sees local pixels x GLOBAL prototypes. The
    n x T_local(B/n) prediction therefore UNDERCOUNTS the true
    per-device work, and tax(n) includes that retained coupling, not
    just collectives.

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
    ap.add_argument("--mesh-devs", default="2,8",
                    help="comma list of n-device mesh rows to measure "
                         "in the same session for the attribution "
                         "(global batch 16; '' to skip)")
    ap.add_argument("--reuse-locals", action="store_true",
                    help="load local_rows from the existing "
                         "SCALING_DIAG.json instead of re-measuring "
                         "(valid only within the same boot/session)")
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

    mesh_devs = []
    for x in args.mesh_devs.split(","):
        if not x:
            continue
        n = int(x)
        # locals are measured at per-device batches 16/8/4/2 only; an n
        # that doesn't divide 16 (or n=16 -> batch-1 local, unmeasured)
        # would KeyError or silently attribute against the wrong batch
        if 16 % n != 0 or 16 // n not in (16, 8, 4, 2):
            ap.error(f"--mesh-devs {n}: need 16 % n == 0 and a "
                     f"measured local row at batch 16//n "
                     f"(valid: 1,2,4,8)")
        mesh_devs.append(n)

    locals_ = {}
    locals_reused = False
    diag_path = os.path.join(ROOT, "SCALING_DIAG.json")
    if args.reuse_locals and os.path.exists(diag_path):
        with open(diag_path) as f:
            for r in json.load(f)["local_rows"]:
                locals_[r["per_device_batch"]] = r
        locals_reused = True
        print(f"reusing local_rows from {diag_path} — attribution is "
              f"NOT same-session (cross-session drift 30-40%)",
              flush=True)
    for b in (16, 8, 4, 2):
        if b in locals_:
            continue
        locals_[b] = {"per_device_batch": b, **measure_local(b)}
        print(json.dumps(locals_[b]), flush=True)

    def measure_mesh(n, b_global=16):
        """Same-session n-device mesh row at the same global batch
        (cpu_mesh_scaling.py's measure(), reps bounded for clock)."""
        cfg.train.batch_size = b_global // n
        mesh = mesh_lib.make_mesh(num_devices=n)
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                    jnp.zeros((b_global, crop, crop, 3)))
        state = mesh_lib.device_put_replicated(state, mesh)
        data = mesh_lib.device_put_batch(
            {k: jnp.asarray(v) for k, v in make_data(b_global).items()},
            mesh)
        train_step = mesh_lib.shard_train_step(
            step_lib.make_train_step(cfg), mesh)
        t0 = time.perf_counter()
        for _ in range(2):
            state, metrics = train_step(state, data)
        jax.block_until_ready(metrics)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(float(metrics["loss"]))
        rep_ms = []
        for _ in range(min(args.reps, 3)):
            t0 = time.perf_counter()
            state, metrics = train_step(state, data)
            jax.block_until_ready(metrics)
            rep_ms.append((time.perf_counter() - t0) * 1000)
        return {"step_ms": round(float(np.median(rep_ms)), 1),
                "rep_spread_ms": [round(x, 1) for x in sorted(rep_ms)],
                "compile_s": round(compile_s, 1)}

    # same-session attribution: T_local(16) IS the (data=1) mesh row
    # (measure_local runs under make_mesh(1) + shard_train_step)
    mesh_rows = []
    attribution = [{
        "mesh": "(data=1)",
        "measured_step_ms": locals_[16]["step_ms"],
        "predicted_serialized_ms": locals_[16]["step_ms"],
        "n_x_local": "identity: T_local(batch 16) is the 1-dev row",
        "gspmd_tax_ms": 0.0, "gspmd_tax_frac": 0.0}]
    for n in mesh_devs:
        row = {"devices": n, "mesh": f"(data={n})",
               "imgs_per_device": 16 // n, **measure_mesh(n)}
        mesh_rows.append(row)
        print(json.dumps(row), flush=True)
        predicted = n * locals_[16 // n]["step_ms"]
        attribution.append({
            "mesh": row["mesh"],
            "measured_step_ms": row["step_ms"],
            "predicted_serialized_ms": round(predicted, 1),
            "n_x_local": f"{n} x T_local(batch {16 // n})",
            "gspmd_tax_ms": round(row["step_ms"] - predicted, 1),
            "gspmd_tax_frac": round(
                row["step_ms"] / predicted - 1.0, 3),
        })
        print(json.dumps(attribution[-1]), flush=True)

    out = {"crop": crop,
           "locals_reused": locals_reused,
           "protocol": ((f"LOCALS REUSED FROM A PRIOR SESSION "
                         f"(--reuse-locals): attribution mixes "
                         f"sessions and inherits 30-40% drift. "
                         if locals_reused else "") +
                        f"SAME-SESSION single-device steps at "
                        f"per-device batches 16/8/4/2 (median of "
                        f"{args.reps} reps) + n-device mesh rows at "
                        f"global 16 (median of {min(args.reps, 3)}), "
                        f"exclusive-priority host; tax(n) = T_mesh(n) "
                        f"- n x T_local(16/n), which includes the "
                        f"sharded loss's retained global prototype "
                        f"coupling (see module docstring)"),
           "local_rows": [locals_[b] for b in (16, 8, 4, 2)],
           "mesh_rows": mesh_rows,
           "attribution_same_session": attribution}
    with open(os.path.join(ROOT, "SCALING_DIAG.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_DIAG.json")


if __name__ == "__main__":
    main()
