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
                "the headline Welch CI (different estimator).",
    }
    # paired decomposition: the same seed's trained model is bitwise
    # identical under both protocols, so wide-vs-narrow per-seed diffs
    # isolate the val-ESTIMATOR noise; if per-seed sd barely shrinks,
    # the A/B variance is MODEL-dominated (init/shuffle quality spread)
    # and widening the split cannot buy convergence.
    narrow = {int(k): v for k, v in
              agg["ours_val_miou_by_seed"].items()}
    paired = sorted(s for s in ours if s in narrow)
    if len(paired) >= 3:
        dif = np.array([ours[s] - narrow[s] for s in paired])
        block["paired_wide_minus_narrow"] = {
            str(s): round(float(ours[s] - narrow[s]), 4)
            for s in paired}
        block["paired_diff_sd"] = round(float(dif.std(ddof=1)), 4)
        est_dom = (block["ours_sd_wide"] is not None
                   and block["ours_sd_wide"] < 0.7 * narrow_sd)
        block["verdict_item8_outcome"] = (
            "CONFIRMED: widening the val split shrank per-seed sd"
            if est_dom else
            "PREMISE REFUTED (measured): per-seed sd did not shrink "
            "(wide sd ~ narrow sd; paired wide-vs-narrow diffs are "
            "small) — the A/B spread is dominated by MODEL variance "
            "(400-iter runs converge to genuinely different-quality "
            "models per seed), not val-estimator noise. More seeds "
            "(already done: n=29/20, hw 0.047) was the only lever; "
            "future threads should budget seeds, not val images.")
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
