"""Host input-pipeline benchmark: can the loader feed N chips?

Reference feed model: one loader batch per device
(/root/reference/spml/utils/general/others.py:50-73) — the host must
sustain global_batch x steps/s items. BASELINE.json's target hardware
is v5e-8: 8 chips x ~73 imgs/s/chip ≈ 580-600 imgs/s of VOC-like
train items (JPEG decode, mirror, random-scale resize, crop-pad 512,
normalize, tag histogram).

This measures, on a VOC-shaped world (make_drill_world.py images —
real 500-max-side JPEG sizes):
  * per-item latency of the fused C++ native path (native/dataio) and
    the Python/PIL fallback, single-threaded;
  * Loader end-to-end throughput vs worker count (the native item is
    ONE ctypes call that releases the GIL, so aggregate throughput
    scales with physical cores, not workers — on this 1-core host the
    curve is flat by construction and the scaling claim rests on the
    GIL-release design + the lock-free per-item independence);
  * the host-core budget table: cores/chip at the measured per-core
    rate, and the core count a v5e-8 needs to stay compute-bound.

Writes LOADER_BENCH.json. Run EXCLUSIVELY (no other load) — results
on a busy host are garbage.

Usage: python pyscripts/misc/loader_bench.py [--root /tmp/drill]
           [--items 200]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                    "..", ".."))
sys.path.insert(0, ROOT)

CHIP_RATES = {"blobby": 72.8, "dense": 60.7}  # imgs/s/chip (PERF.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/drill")
    ap.add_argument("--items", type=int, default=200)
    ap.add_argument("--out",
                    default=os.path.join(ROOT, "LOADER_BENCH.json"))
    args = ap.parse_args()

    from pyscripts.misc.make_drill_world import make_world
    from spml_tpu.data import datasets

    world = os.path.join(args.root, "VOCdevkit")
    if not os.path.isdir(os.path.join(world, "VOC2012", "JPEGImages")):
        make_world(world, 200, 40)
    train_list = os.path.join(world, "lists", "scribble.txt")

    def make_ds(seed=0):
        return datasets.ListTagDataset(
            world, train_list,
            img_mean=(0.485, 0.456, 0.406), img_std=(0.229, 0.224, 0.225),
            size=(512, 512), random_crop=True, random_scale=True,
            random_mirror=True, training=True, seed=seed)

    n_cores = os.cpu_count()
    result = {"host_cores": n_cores, "crop": 512,
              "world": "VOC-shaped synthetic (max side 500)"}

    # --- single-thread per-item cost, native vs python ---
    for native in (True, False):
        ds = make_ds()
        ds.use_native = native
        # warm caches / lazy builds
        for i in range(4):
            ds[i % len(ds)]
        t0 = time.perf_counter()
        n = min(args.items, 4 * len(ds))
        for i in range(n):
            ds[i % len(ds)]
        dt = (time.perf_counter() - t0) / n
        key = "native" if native else "python"
        result[f"{key}_ms_per_item"] = round(dt * 1000, 2)
        result[f"{key}_imgs_per_sec_per_core"] = round(1.0 / dt, 1)

    # --- Loader end-to-end vs workers (threaded; GIL-free items) ---
    curve = []
    for workers in (1, 2, 4, 8):
        ds = make_ds()
        loader = datasets.Loader(ds, global_batch=8, shuffle=True,
                                 num_workers=workers, prefetch=4)
        it = iter(loader)
        next(it)  # warm the pool and prefetch
        n_batches = max(4, args.items // 8)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        curve.append({"workers": workers,
                      "imgs_per_sec": round(n_batches * 8 / dt, 1)})
    result["loader_curve"] = curve

    # --- the budget table ---
    rate = result["native_imgs_per_sec_per_core"]
    result["core_budget"] = {
        k: {"chip_imgs_per_sec": v,
            "cores_per_chip": round(v / rate, 2),
            "cores_for_v5e8": round(8 * v / rate, 1)}
        for k, v in CHIP_RATES.items()}
    result["note"] = (
        f"This dev host has {n_cores} core(s); >=600 imgs/s cannot be "
        "demonstrated locally. The extrapolation basis: each train item "
        "is ONE ctypes call into native/dataio that releases the GIL "
        "for its whole body (decode/mirror/resize/crop/normalize) and "
        "touches no shared mutable state, so aggregate throughput "
        "scales with physical cores; the loader_curve on 1 core is "
        "flat (threads time-share one core) as expected. A v5e-8 host "
        "needs cores_for_v5e8 cores to keep 8 chips compute-bound — "
        "well under the 100+ vCPUs production v5e hosts carry.")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
