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


def _make_shim(shim_dir, log_path, reg_dir):
    """python3 shim wrapping every stage the bash pipeline launches.

    Adds (round-4, VERDICT item 3) hang-proofing:
    - per-stage RESUME: each stage is keyed on md5(argv); a stage that
      already completed with rc=0 (marker in reg_dir) is skipped when
      SPML_DRILL_RESUME=1, replaying its recorded stdout so benchmark
      "mean IOU:" lines stay in the pipeline stdout for parsing.
    - per-stage TIMEOUT with one retry: SPML_DRILL_STAGE_TIMEOUT seconds
      (default 7200); rc=124 triggers exactly one retry (train stages
      resume from their own orbax snapshots where present).
    """
    os.makedirs(shim_dir, exist_ok=True)
    os.makedirs(reg_dir, exist_ok=True)
    real = shutil.which("python3")
    shim = os.path.join(shim_dir, "python3")
    with open(shim, "w") as f:
        f.write(f"""#!/bin/bash
key=$(printf '%s ' "$@" | md5sum | cut -d' ' -f1)
reg={reg_dir}
nc() {{ ls {CACHE_DIR} 2>/dev/null | wc -l; }}
if [ "${{SPML_DRILL_RESUME:-0}}" = "1" ] && [ -f $reg/$key.rc0 ]; then
  echo "$(date +%s.%N) SKIP $key $@" >> {log_path}
  cat $reg/$key.out 2>/dev/null
  exit 0
fi
echo "$(date +%s.%N) START $key $(nc) $@" >> {log_path}
set -o pipefail
timeout ${{SPML_DRILL_STAGE_TIMEOUT:-7200}} {real} "$@" 2>&1 | tee $reg/$key.out
rc=$?
if [ $rc -eq 124 ]; then
  echo "$(date +%s.%N) RETRY $key $@" >> {log_path}
  timeout ${{SPML_DRILL_STAGE_TIMEOUT:-7200}} {real} "$@" 2>&1 | tee $reg/$key.out
  rc=$?
fi
echo "$(date +%s.%N) END $key $rc:$(nc) $@" >> {log_path}
[ $rc -eq 0 ] && touch $reg/$key.rc0
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
    """Parse the shim timing log into an ordered per-stage list.

    The log persists across resume reruns: a resumed pipeline replays
    SKIP lines for cached stages while the original run's START/END
    pairs (with the real wall-clock) are earlier in the same file.
    Stages are keyed on the shim's md5(argv): order of first
    appearance, data from the last completed END (so a failed stage
    that later succeeds reports the successful run); SKIPped stages
    keep the original timing and are marked resumed_from_cache.
    """
    if not os.path.exists(log_path):
        return []
    order = []            # keys in first-appearance order
    best = {}             # key -> stage dict from last END
    skipped = set()
    starts = {}           # key -> (ts, nc) for the open START
    with open(log_path) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ", 4)
            if len(parts) < 4:
                continue
            ts, kind, key = float(parts[0]), parts[1], parts[2]
            if len(key) != 32:  # md5 argv key; skips pre-resume-format
                continue        # lines from a stale round-3 log
            if key not in best and key not in starts and key not in skipped:
                order.append(key)
            if kind == "START" and len(parts) >= 5:
                starts[key] = (ts, int(parts[3]))
            elif kind == "SKIP":
                skipped.add(key)
            elif kind == "END" and len(parts) >= 5 and key in starts:
                ts0, nc0 = starts.pop(key)
                rc, nc1 = parts[3].split(":")
                best[key] = {
                    "stage": _stage_label(parts[4]),
                    "seconds": round(ts - ts0, 1),
                    "rc": int(rc),
                    "new_xla_compiles": int(nc1) - nc0,
                }
    out = []
    for key in order:
        if key not in best:
            continue  # dangling START (killed mid-stage, never finished)
        st = dict(best[key])
        if key in skipped:
            st["resumed_from_cache"] = True
        out.append(st)
    return out


def run_pipeline(kind, world, snap, iters, cls_iters, log_dir,
                 extra_env=None, resume=False, stage_timeout=7200,
                 run_name=None):
    run_name = run_name or kind
    timing_log = os.path.join(log_dir, f"timing_{run_name}.log")
    reg_dir = os.path.join(log_dir, f"stage_done_{run_name}")
    if not resume:
        if os.path.exists(timing_log):
            os.remove(timing_log)
        shutil.rmtree(reg_dir, ignore_errors=True)
    shim_dir = _make_shim(os.path.join(log_dir, f"shim_{run_name}"),
                          timing_log, reg_dir)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PATH"] = shim_dir + os.pathsep + env.get("PATH", "")
    env["SPML_DRILL_RESUME"] = "1" if resume else "0"
    env["SPML_DRILL_STAGE_TIMEOUT"] = str(stage_timeout)
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
        # (densepose: crop 512, pspnet dim 32, 24x24 inference k-means,
        # MSC 640 — train_spml_point.sh defaults)
    })
    if extra_env:
        env.update(extra_env)
    if kind == "scribble":
        env["TRAIN_DATA_LIST"] = os.path.join(lists, "scribble.txt")
        script = "bashscripts/voc12/train_spml_scribble.sh"
    elif kind == "densepose":
        env["TRAIN_DATA_LIST"] = os.path.join(lists, "train_points.txt")
        script = "bashscripts/densepose/train_spml_point.sh"
    else:
        env["TRAIN_DATA_LIST"] = os.path.join(lists, "seam.txt")
        env["CAM_DIR"] = os.path.join(world, "VOC2012", "cam", "seam")
        script = "bashscripts/voc12/train_spml_tag.sh"

    out_log = os.path.join(log_dir, f"stdout_{run_name}.log")
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
    # (resumed stages replay their recorded stdout, so the lines appear
    # in pipeline order even on a resumed rerun)
    bench_stages = [s for s in stages
                    if s["stage"].startswith("benchmark_by_")]
    for st, miou in zip(bench_stages, mious):
        st["mean_iou"] = miou

    r = {
        "pipeline": kind,
        "rc": proc.returncode,
        "total_seconds": round(total, 1),
        "new_xla_cache_entries": len(after - before),
        "stages": stages,
        "benchmark_mious": mious,
        "stdout_log": out_log,
    }
    n_resumed = sum(1 for s in stages if s.get("resumed_from_cache"))
    if n_resumed:
        r["resumed_stages"] = n_resumed
        r["stage_seconds_sum"] = round(sum(s["seconds"] for s in stages), 1)
    return r


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
    ap.add_argument("--resume", action="store_true",
                    help="skip stages that already completed rc=0 in a "
                         "previous (possibly killed) run of the same "
                         "--root; replays their stdout and keeps their "
                         "original timings")
    ap.add_argument("--pretrained", default=None,
                    help="backbone .pth for the PRETRAINED env var "
                         "(pretrain_drill_backbone.py output); also "
                         "switches BN_MOMENTUM to the reference's "
                         "pretrained-stats default 3e-4")
    ap.add_argument("--snap_suffix", default="",
                    help="suffix for snap/registry/log names (run a "
                         "second arm of the same pipeline kind in the "
                         "same --root without clobbering the first, "
                         "e.g. '_pretrained')")
    ap.add_argument("--stage_timeout", type=int, default=7200,
                    help="per-stage wall-clock timeout in seconds; a "
                         "timed-out stage is retried exactly once "
                         "(tunnel compile-service hangs)")
    args = ap.parse_args()

    def smoke_env(kind):
        extra = {}
        if args.pretrained:
            extra["PRETRAINED"] = args.pretrained
            # reference semantics: pretrained BN statistics -> 3e-4
            # (resnet_deeplab.py:234-243 defaults; common.sh fallback)
            extra["BN_MOMENTUM"] = "3e-4"
        if not args.smoke:
            return extra or None
        e = {
            "SPML_TPU_PLATFORM": "cpu",
            "BACKBONE_TYPES": "panoptic_deeplab_10",
            "EMBEDDING_DIM": "8", "CROP_SIZE": "64", "BATCH_SIZE": "2",
            "KMEANS_ITERATIONS": "2", "KMEANS_NUM_CLUSTERS": "2",
            "CLS_BATCH_SIZE": "2", "INFERENCE_IMAGE_SIZE": "128",
            "INFERENCE_CROP_SIZE_H": "128",
            "INFERENCE_CROP_SIZE_W": "128", "INFERENCE_STRIDE": "128",
        }
        if kind == "densepose":
            e["BACKBONE_TYPES"] = "panoptic_pspnet_10_densepose"
        e.update(extra)
        return e

    from pyscripts.misc.make_drill_world import make_world
    from pyscripts.misc.make_densepose_drill_world import (
        make_world as make_dp_world)

    kinds = args.pipelines.split(",")
    world = os.path.join(args.root, "VOCdevkit")
    if any(k != "densepose" for k in kinds) and not os.path.isdir(
            os.path.join(world, "VOC2012", "JPEGImages")):
        print("building drill world ...", flush=True)
        make_world(world, args.n_train, args.n_val)
    dp_world = os.path.join(args.root, "densepose_world")
    if "densepose" in kinds and not os.path.isdir(
            os.path.join(dp_world, "images")):
        print("building densepose drill world ...", flush=True)
        make_dp_world(dp_world, args.n_train, args.n_val)

    # header blocks must describe THIS run's pipelines only (round-4
    # verdict: DENSEPOSE_DRILL.json shipped with the scribble drill's
    # world/config as its header because these were unconditional)
    results = {
        "xla_cache_warm_at_start": len(_cache_entries()) > 0,
        "pipelines": [],
    }
    if any(k != "densepose" for k in kinds):
        results["world"] = {
            "n_train": args.n_train, "n_val": args.n_val,
            "classes": 21, "aspect_spread": "VOC (max side 500)",
            "generator": "pyscripts/misc/make_drill_world.py"}
        results["config"] = {
            "crop": 512, "batch": 4,
            "backbone": ("panoptic_deeplab_101 (PRETRAINED synth "
                         "backbone init, bn momentum 3e-4 — see "
                         "pretrained_init block)" if args.pretrained
                         else "panoptic_deeplab_101 (from scratch, "
                              "bn momentum 0.1 — no CUHK weights in "
                              "this image)"),
            "embedding_dim": 64, "train_iters": args.iters,
            "classifier_iters": args.cls_iters}
    if args.pretrained:
        results["pretrained_init"] = {
            "path": args.pretrained, "bn_momentum": "3e-4",
            "source": "pyscripts/misc/pretrain_drill_backbone.py "
                      "(dense-CE ImageNet-pretrain proxy; see "
                      "PRETRAIN_BACKBONE.json)"}
    if "densepose" in kinds:
        results["densepose_world"] = {
            "n_train": args.n_train, "n_val": args.n_val, "classes": 15,
            "config": "crop 512, pspnet_101_densepose dim 32, batch 4, "
                      "24x24 inference k-means, MSC 640 "
                      "(train_spml_point.sh defaults)",
            "generator": "pyscripts/misc/make_densepose_drill_world.py"}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        # carry forward header blocks for pipelines kept from the prior
        # file that this run doesn't re-describe
        for key in ("world", "config", "densepose_world", "notes"):
            if key not in results and key in prev:
                results[key] = prev[key]
        results["pipelines"] = [p for p in prev.get("pipelines", [])]
    for kind in kinds:
        run_name = kind + args.snap_suffix
        print(f"=== drill: {run_name} pipeline ===", flush=True)
        snap = os.path.join(args.root, f"snap_{run_name}")
        r = run_pipeline(kind, dp_world if kind == "densepose" else world,
                         snap, args.iters, args.cls_iters,
                         args.root, smoke_env(kind), resume=args.resume,
                         stage_timeout=args.stage_timeout,
                         run_name=run_name)
        results["pipelines"] = [p for p in results["pipelines"]
                                if p.get("pipeline") != kind] + [r]
        print(json.dumps({k: v for k, v in r.items()
                          if k != "stages"}, indent=1), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
