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
        "tpu": {"segment_capacity": 256, "compute_dtype": "bfloat16"},
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
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {steps} steps in {dt:.3f}s "
          f"({batch * steps / dt:.2f} imgs/s)", file=sys.stderr)
    return dt, steps, batch


def _classify(name):
    n = name.lower()
    if "convolution" in n or "conv" in n:
        return "conv"
    if "pallas" in n or "segsort" in n or "custom-call" in n:
        return "pallas/custom"
    if any(k in n for k in ("dot", "einsum", "matmul")):
        return "matmul"
    if any(k in n for k in ("fusion", "add", "multiply", "subtract",
                            "divide", "rsqrt", "exp", "maximum", "select",
                            "compare", "reduce", "broadcast", "convert",
                            "transpose", "copy", "bitcast", "scatter",
                            "gather", "iota", "sort", "dynamic")):
        return "fusion/elementwise"
    return "other"


def summarize(out_dir, top=30):
    """Parse the captured .xplane.pb and print device op self-times."""
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()     # op name -> total duration ps
    per_class = collections.Counter()
    device_total_ps = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        if not ev_meta:
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA op lines carry the per-op events; step lines duplicate
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                device_total_ps += ev.duration_ps
    for name, ps in per_op.items():
        per_class[_classify(name)] += ps

    return per_op, per_class, device_total_ps, paths[-1]


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
    per_op, per_class, total_ps, path = res
    total_ms = total_ps / 1e9
    print(f"\nxplane: {path}", file=sys.stderr)
    print(f"device op time total: {total_ms:.1f} ms over {steps} steps "
          f"({total_ms / steps:.1f} ms/step; wall {dt * 1e3 / steps:.1f}"
          " ms/step)", file=sys.stderr)
    print("\n== by class ==", file=sys.stderr)
    for cls, ps in per_class.most_common():
        print(f"  {cls:20s} {ps / 1e9:9.1f} ms  "
              f"{100 * ps / total_ps:5.1f}%", file=sys.stderr)
    print("\n== top ops ==", file=sys.stderr)
    for name, ps in per_op.most_common(30):
        print(f"  {ps / 1e9:8.2f} ms  {100 * ps / total_ps:5.1f}%  "
              f"{name[:100]}", file=sys.stderr)
    print(json.dumps({
        "metric": "trace_device_ms_per_step",
        "value": round(total_ms / steps, 2),
        "unit": "ms",
        "classes_ms": {k: round(v / 1e9 / steps, 2)
                       for k, v in per_class.most_common()},
    }))


if __name__ == "__main__":
    main()
