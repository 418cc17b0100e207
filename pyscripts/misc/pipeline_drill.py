"""Full-scale pipeline drill: run the ACTUAL bash pipelines
(bashscripts/voc12/train_spml_scribble.sh and train_spml_tag.sh —
reference surface: twke18/SPML same paths) end-to-end at flagship
shapes (crop 512, ResNet-101, dim 64, batch 4, MSC/CRF inference) on a
VOC-shaped synthetic world (make_drill_world.py), on the real TPU.

Records per-stage wall-clock, the XLA compile budget (new persistent-
cache entries per stage = fresh compilations), and every benchmark
stage's mIoU into PIPELINE_DRILL.json. This is the day-1 readiness
proof for when real VOC lands: every stage runs at flagship shapes
with the time budget documented.

Per-stage timing uses a python3 shim on PATH that logs start/end
timestamps around each stage process the bash script launches.

Usage: python pyscripts/misc/pipeline_drill.py \
           [--root /tmp/drill] [--iters 300] [--cls_iters 800] \
           [--pipelines scribble,tag] [--n_train 200] [--n_val 40]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                    "..", ".."))
sys.path.insert(0, ROOT)

CACHE_DIR = os.path.expanduser("~/.cache/spml_tpu_xla")


def _make_shim(shim_dir, log_path):
    os.makedirs(shim_dir, exist_ok=True)
    real = shutil.which("python3")
    shim = os.path.join(shim_dir, "python3")
    with open(shim, "w") as f:
        f.write(f"""#!/bin/bash
nc() {{ ls {CACHE_DIR} 2>/dev/null | wc -l; }}
echo "$(date +%s.%N) START $(nc) $@" >> {log_path}
{real} "$@"
rc=$?
echo "$(date +%s.%N) END $rc:$(nc) $@" >> {log_path}
exit $rc
""")
    os.chmod(shim, 0o755)
    return shim_dir


def _cache_entries():
    if not os.path.isdir(CACHE_DIR):
        return set()
    return set(os.listdir(CACHE_DIR))


def _stage_label(argv_tail):
    m = re.search(r"(pyscripts/\S+\.py)", argv_tail)
    script = m.group(1) if m else argv_tail.split()[0]
    label = os.path.basename(script).replace(".py", "")
    m = re.search(r"--save_dir (\S+)", argv_tail)
    if m:
        label += ":" + "/".join(m.group(1).rstrip("/").split("/")[-2:])
    m = re.search(r"--pred_dir (\S+)", argv_tail)
    if m:
        # keep the snapshot component too (.../stage1/results/val) so
        # benchmark rows over different snapshots stay distinguishable
        label += ":" + "/".join(m.group(1).rstrip("/").split("/")[-4:-1])
    m = re.search(r"--snapshot_dir (\S+)", argv_tail)
    if m and "train" in label:
        label += ":" + os.path.basename(m.group(1).rstrip("/"))
    return label


def _parse_timing(log_path):
    stages = []
    if not os.path.exists(log_path):
        return stages
    starts = []
    with open(log_path) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ", 3)
            if len(parts) < 4:
                continue
            ts, kind = float(parts[0]), parts[1]
            if kind == "START":
                starts.append((ts, int(parts[2]), parts[3]))
            elif kind == "END" and starts:
                ts0, nc0, argv = starts.pop()
                rc, nc1 = parts[2].split(":")
                stages.append({
                    "stage": _stage_label(argv),
                    "seconds": round(ts - ts0, 1),
                    "rc": int(rc),
                    "new_xla_compiles": int(nc1) - nc0,
                })
    return stages


def run_pipeline(kind, world, snap, iters, cls_iters, log_dir,
                 extra_env=None):
    timing_log = os.path.join(log_dir, f"timing_{kind}.log")
    if os.path.exists(timing_log):
        os.remove(timing_log)
    shim_dir = _make_shim(os.path.join(log_dir, "shim"), timing_log)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PATH"] = shim_dir + os.pathsep + env.get("PATH", "")
    lists = os.path.join(world, "lists")
    env.update({
        "DATAROOT": world,
        "SNAPSHOT_DIR": snap,
        "MEMORY_DATA_LIST": os.path.join(lists, "memory.txt"),
        "TEST_DATA_LIST": os.path.join(lists, "val.txt"),
        "PRETRAINED": os.path.join(world, "no_pretrained.pth"),
        "BN_MOMENTUM": "0.1",  # from-scratch (no CUHK weights in image)
        "MAX_ITERATION": str(iters),
        "SNAPSHOT_STEP": str(iters),
        "CLS_MAX_ITERATION": str(cls_iters),
        # flagship shapes stay at the bash defaults: crop 512, batch 4,
        # ResNet-101, dim 64, kmeans 6x6x10, memory bank 2, MSC 512
    })
    if extra_env:
        env.update(extra_env)
    if kind == "scribble":
        env["TRAIN_DATA_LIST"] = os.path.join(lists, "scribble.txt")
        script = "bashscripts/voc12/train_spml_scribble.sh"
    else:
        env["TRAIN_DATA_LIST"] = os.path.join(lists, "seam.txt")
        env["CAM_DIR"] = os.path.join(world, "VOC2012", "cam", "seam")
        script = "bashscripts/voc12/train_spml_tag.sh"

    out_log = os.path.join(log_dir, f"stdout_{kind}.log")
    t0 = time.time()
    before = _cache_entries()
    with open(out_log, "w") as f:
        proc = subprocess.run(["bash", "-ec", f"source {script}"],
                              cwd=ROOT, env=env, stdout=f,
                              stderr=subprocess.STDOUT, text=True)
    total = time.time() - t0
    after = _cache_entries()

    with open(out_log) as f:
        stdout = f.read()
    mious = [float(m) / 100 for m in
             re.findall(r"mean IOU: *([0-9.]+)%", stdout)]

    stages = _parse_timing(timing_log)
    # fold benchmark mIoUs onto the benchmark stages in order; BOTH
    # benchmark_by_mIoU and benchmark_by_instance print exactly one
    # "mean IOU:" line each, so fold over both kinds to stay aligned
    bench_stages = [s for s in stages
                    if s["stage"].startswith("benchmark_by_")]
    for st, miou in zip(bench_stages, mious):
        st["mean_iou"] = miou

    return {
        "pipeline": kind,
        "rc": proc.returncode,
        "total_seconds": round(total, 1),
        "new_xla_cache_entries": len(after - before),
        "stages": stages,
        "benchmark_mious": mious,
        "stdout_log": out_log,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/drill")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--cls_iters", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=200)
    ap.add_argument("--n_val", type=int, default=40)
    ap.add_argument("--pipelines", default="scribble,tag")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU — validates the drill "
                         "machinery itself, not a flagship measurement")
    ap.add_argument("--out",
                    default=os.path.join(ROOT, "PIPELINE_DRILL.json"))
    ap.add_argument("--merge", action="store_true",
                    help="keep pipelines already recorded in --out "
                         "(a re-run pipeline kind replaces its old "
                         "entry)")
    args = ap.parse_args()

    extra_env = None
    if args.smoke:
        extra_env = {
            "SPML_TPU_PLATFORM": "cpu",
            "BACKBONE_TYPES": "panoptic_deeplab_10",
            "EMBEDDING_DIM": "8", "CROP_SIZE": "64", "BATCH_SIZE": "2",
            "KMEANS_ITERATIONS": "2", "KMEANS_NUM_CLUSTERS": "2",
            "CLS_BATCH_SIZE": "2", "INFERENCE_IMAGE_SIZE": "128",
            "INFERENCE_CROP_SIZE_H": "128",
            "INFERENCE_CROP_SIZE_W": "128", "INFERENCE_STRIDE": "128",
        }

    from pyscripts.misc.make_drill_world import make_world

    world = os.path.join(args.root, "VOCdevkit")
    if not os.path.isdir(os.path.join(world, "VOC2012", "JPEGImages")):
        print("building drill world ...", flush=True)
        make_world(world, args.n_train, args.n_val)

    results = {
        "world": {"n_train": args.n_train, "n_val": args.n_val,
                  "classes": 21, "aspect_spread": "VOC (max side 500)",
                  "generator": "pyscripts/misc/make_drill_world.py"},
        "config": {"crop": 512, "batch": 4,
                   "backbone": "panoptic_deeplab_101 (from scratch, "
                               "bn momentum 0.1 — no CUHK weights in "
                               "this image)",
                   "embedding_dim": 64, "train_iters": args.iters,
                   "classifier_iters": args.cls_iters},
        "xla_cache_warm_at_start": len(_cache_entries()) > 0,
        "pipelines": [],
    }
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        results["pipelines"] = [p for p in prev.get("pipelines", [])]
        results["notes"] = prev.get("notes", [])
    for kind in args.pipelines.split(","):
        print(f"=== drill: {kind} pipeline ===", flush=True)
        snap = os.path.join(args.root, f"snap_{kind}")
        r = run_pipeline(kind, world, snap, args.iters, args.cls_iters,
                         args.root, extra_env)
        results["pipelines"] = [p for p in results["pipelines"]
                                if p.get("pipeline") != kind] + [r]
        print(json.dumps({k: v for k, v in r.items()
                          if k != "stages"}, indent=1), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
