"""Capture a jax.profiler device trace of the flagship train step on the
real TPU chip and summarize where the time goes.

Reuses bench.py's exact setup (flagship scribble config, blobby labels,
batch 8 / crop 512 bf16) and wraps a few steady-state steps in
jax.profiler.start_trace/stop_trace — the same capture the train driver
does when tpu.profile_dir is set (spml_tpu/train/driver.py::_TraceWindow).
Then parses the XPlane proto with tensorboard_plugin_profile and prints
the top device ops by self time, bucketed into conv / loss-kernel /
elementwise-glue classes, as evidence for the PERF.md roofline breakdown.

Usage: python pyscripts/misc/capture_tpu_trace.py [--dense] [--steps N]
       [--out DIR]

The reference has no profiler at all (SURVEY.md §5).
"""

import collections
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def capture(out_dir, steps=6, dense=False):
    import jax
    import jax.numpy as jnp

    from spml_tpu.cli import enable_compilation_cache
    from spml_tpu.config import load_config
    from spml_tpu.parallel import mesh as mesh_lib
    from spml_tpu.train import step as step_lib

    batch, crop = 8, 512
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
                "use_fused_loss": True},   # the bench.py headline path
    })
    enable_compilation_cache(cfg)

    mesh = mesh_lib.make_mesh(num_devices=1)
    if dense:
        rng = np.random.RandomState(0)
        data = {
            "image": jnp.asarray(rng.randn(batch, crop, crop, 3),
                                 jnp.float32),
            "semantic_label": jnp.asarray(
                rng.randint(0, 21, (batch, crop, crop)), jnp.int32),
            "instance_label": jnp.asarray(
                rng.randint(0, 64, (batch, crop, crop)), jnp.int32),
            "semantic_tag": jnp.asarray(
                np.random.RandomState(1).rand(batch, 256) > 0.8,
                jnp.int32),
        }
    else:
        import pyscripts.misc.lockstep_parity as lp
        lp.SCEN.update(batch=batch, crop=crop, num_classes=21, ignore=255)
        b = lp.make_batches(1)[0]
        data = {k: jnp.asarray(v) for k, v in b.items()}

    state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                jnp.zeros((batch, crop, crop, 3)))
    state = mesh_lib.device_put_replicated(state, mesh)
    data = mesh_lib.device_put_batch(data, mesh)
    train_step = mesh_lib.shard_train_step(step_lib.make_train_step(cfg),
                                           mesh)

    for _ in range(3):  # compile + settle
        state, metrics = train_step(state, data)
    jax.block_until_ready(metrics)

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, data)
    # forced scalar read: on the tunneled backend block_until_ready can
    # return early (CLAUDE.md timing trap); the loss is chained through
    # every step's donated state, so float() waits for all of them
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {steps} steps in {dt:.3f}s "
          f"({batch * steps / dt:.2f} imgs/s)", file=sys.stderr)
    return dt, steps, batch


PEAK_BF16 = 197e12   # v5e MXU bf16 FLOP/s
HBM_BW = 819e9       # v5e HBM bytes/s


def summarize(out_dir):
    """Parse the captured Chrome trace (.trace.json.gz — written next to
    the .xplane.pb) and aggregate device-op time, FLOPs, and bytes. The
    device plane (e.g. '/device:TPU:0') has hierarchical lanes; only the
    'XLA Ops' lane is summed, so totals aren't double-counted against
    the 'Steps'/'XLA Modules' lanes. Each op event carries
    hlo_category / model_flops / raw_bytes_accessed, which gives the
    per-category roofline (MFU vs PEAK_BF16, achieved GB/s vs HBM_BW)
    directly from hardware timestamps."""
    import gzip

    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no trace.json.gz found", file=sys.stderr)
        return None
    with gzip.open(paths[-1]) as f:
        events = json.load(f)["traceEvents"]

    dev_pids, op_tids, step_tids = set(), {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and (
                "TPU" in e["args"].get("name", "")
                or "device" in e["args"].get("name", "").lower()):
            dev_pids.add(e["pid"])
        if e.get("name") == "thread_name":
            nm = e["args"].get("name", "")
            if nm == "XLA Ops":
                op_tids[e["pid"]] = e["tid"]
            elif nm == "Steps":
                step_tids[e["pid"]] = e["tid"]

    zero = lambda: [0.0, 0.0, 0.0, 0]          # us, flops, bytes, count
    per_op = collections.defaultdict(zero)     # (name, tf_op) -> acc
    per_class = collections.defaultdict(zero)  # hlo_category -> acc
    n_steps, steps_us = 0, 0
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        if e["tid"] == step_tids.get(e["pid"]):
            n_steps += 1
            steps_us += e.get("dur", 0)
            continue
        if e["tid"] != op_tids.get(e["pid"]):
            continue
        a = e.get("args") or {}
        dur = e.get("dur", 0)
        flops = float(a.get("model_flops", 0) or 0)
        byts = float(a.get("raw_bytes_accessed",
                           a.get("bytes_accessed", 0)) or 0)
        for acc in (per_op[(e["name"], a.get("tf_op", "")[:90])],
                    per_class[a.get("hlo_category", "?")]):
            acc[0] += dur
            acc[1] += flops
            acc[2] += byts
            acc[3] += 1
    return per_op, per_class, steps_us, n_steps, paths[-1]


def main():
    out = "/tmp/spml_trace"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 6
    os.makedirs(out, exist_ok=True)

    dt, steps, batch = capture(out, steps=steps,
                               dense="--dense" in sys.argv)
    res = summarize(out)
    if res is None:
        return
    per_op, per_class, steps_us, n_steps, path = res
    n = max(n_steps, 1)
    tot_us = sum(v[0] for v in per_class.values())
    tot_fl = sum(v[1] for v in per_class.values())
    tot_by = sum(v[2] for v in per_class.values())
    mfu = tot_fl / (tot_us * 1e-6) / PEAK_BF16
    hbm = tot_by / (tot_us * 1e-6) / HBM_BW
    print(f"\ntrace: {path}", file=sys.stderr)
    print(f"device: {n_steps} steps, {steps_us / 1e3 / n:.1f} ms/step; "
          f"{tot_fl / n / 1e9:.0f} GFLOP/step -> {mfu:.1%} MFU; "
          f"{tot_by / n / 1e9:.2f} GB/step -> {hbm:.1%} of HBM peak; "
          f"host wall {dt * 1e3 / steps:.1f} ms/step", file=sys.stderr)
    print(f"\n== by hlo_category ==\n  {'category':26s} {'ms/st':>6s} "
          f"{'%':>5s} {'MFU':>6s} {'GB/s':>5s} {'n/st':>5s}",
          file=sys.stderr)
    for cls, (us, fl, by, cnt) in sorted(per_class.items(),
                                         key=lambda kv: -kv[1][0]):
        if us == 0:
            continue
        print(f"  {cls:26s} {us / 1e3 / n:6.1f} {100 * us / tot_us:4.1f}% "
              f"{fl / (us * 1e-6) / PEAK_BF16:6.1%} "
              f"{by / us * 1e-3:5.0f} {cnt / n:5.0f}", file=sys.stderr)
    print("\n== top ops ==", file=sys.stderr)
    for (name, tfop), (us, fl, by, cnt) in sorted(
            per_op.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"  {us / 1e3 / n:6.2f} ms "
              f"{fl / (us * 1e-6) / PEAK_BF16:6.1%} MFU "
              f"{by / us * 1e-3:5.0f} GB/s  {name[:26]:26s} {tfop[:64]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "trace_device_ms_per_step",
        "value": round(steps_us / 1e3 / n, 2),
        "unit": "ms",
        "gflop_per_step": round(tot_fl / n / 1e9, 1),
        "gb_per_step": round(tot_by / n / 1e9, 2),
        "mfu": round(mfu, 4),
        "hbm_frac": round(hbm, 4),
        "classes_ms": {k: round(v[0] / 1e3 / n, 2)
                       for k, v in sorted(per_class.items(),
                                          key=lambda kv: -kv[1][0])},
    }))


if __name__ == "__main__":
    main()
