"""Fold the wide-val (n_val=36) seed runs into SYNTH_SEEDS.json as a
separate protocol block (round-4 verdict item 8).

The wide protocol changes ONLY the val estimator: synthetic_e2e.py
draws the 48 train images first from the fixed world rng, so a given
seed's trained model is bitwise identical under n_val=12 and n_val=36
— the per-seed val mIoU difference is purely val-split sampling noise.
Widening 12 -> 36 should cut per-seed sd ~sqrt(3), letting future A/B
threads converge in ~1/3 the seeds. This script records the wide rows,
their sd, and the narrow-protocol sd for comparison. Wide rows are
NEVER mixed into the headline Welch CI (different estimator).

Usage: python pyscripts/misc/aggregate_wide_seeds.py \
           [--ours GLOB] [--ref GLOB] [--out SYNTH_SEEDS.json]
"""

import argparse
import glob
import json
import os
import re

import numpy as np


def _load(patterns):
    out = {}
    for pat in patterns:
        for path in sorted(glob.glob(os.path.expanduser(pat))):
            with open(path) as f:
                d = json.load(f)
            assert d.get("n_val", 12) == 36, \
                f"{path}: not a wide-val run (n_val={d.get('n_val')})"
            m = re.search(r"_s(\d+)\.json$", path)
            seed = d.get("seed", int(m.group(1)) if m else 0)
            out[int(seed)] = d["val_miou"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", action="append", default=None)
    ap.add_argument("--ref", action="append", default=None)
    ap.add_argument("--out", default="SYNTH_SEEDS.json")
    args = ap.parse_args()
    ours = _load(args.ours or ["/tmp/SYNTH_E2E_WIDE_s*.json",
                               "artifacts/seeds/SYNTH_E2E_WIDE_s*.json"])
    ref = _load(args.ref or ["/tmp/SYNTH_REF_WIDE_s*.json",
                             "artifacts/seeds/SYNTH_REF_WIDE_s*.json"])

    with open(args.out) as f:
        agg = json.load(f)
    narrow_sd = agg["welch_ours_minus_reference"]["ours_sd"]
    o = np.array([v for _, v in sorted(ours.items())], float)
    block = {
        "n_val": 36,
        "ours_val_miou_by_seed": {str(k): v
                                  for k, v in sorted(ours.items())},
        "reference_val_miou_by_seed": {str(k): v
                                       for k, v in sorted(ref.items())},
        "ours_sd_wide": round(float(o.std(ddof=1)), 4)
        if len(o) >= 2 else None,
        "ours_sd_narrow_for_reference": narrow_sd,
        "note": "same trained models as the narrow protocol (train "
                "split drawn first from the fixed world rng; "
                "synthetic_e2e.py --n_val docstring) — only the val "
                "estimator widened 12 -> 36 images. NOT folded into "
                "the headline Welch CI (different estimator; this "
                "block exists so future A/B threads use the wide "
                "protocol and converge in ~1/3 the seeds).",
    }
    if len(ref) >= 2:
        r = np.array([v for _, v in sorted(ref.items())], float)
        block["reference_sd_wide"] = round(float(r.std(ddof=1)), 4)
        block["diff_mean_wide"] = round(float(o.mean() - r.mean()), 4)
    agg["wide_val_protocol"] = block
    with open(args.out, "w") as f:
        json.dump(agg, f, indent=1)
    print(json.dumps(block, indent=1))


if __name__ == "__main__":
    main()
