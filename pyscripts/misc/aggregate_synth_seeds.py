"""Aggregate the multi-seed synthetic-world parity runs into
SYNTH_SEEDS.json.

Inputs: per-seed results produced by pyscripts/misc/synthetic_e2e.py
(ours, full scribble pipeline on TPU) and
pyscripts/misc/synthetic_e2e_reference.py (the reference's own torch
code from /root/reference on CPU) on the IDENTICAL synthetic world and
hyperparameters. This is the real-data mIoU proxy while VOC12 is
unavailable in this image (zero egress): same worlds, same recipe, two
implementations — the per-seed spread shows the 400-iteration runs are
noisy, so the comparison is matched-seed and mean.

Usage: python pyscripts/misc/aggregate_synth_seeds.py \
           [--ours GLOB]... [--ref GLOB]... [--out SYNTH_SEEDS.json]
"""

import argparse
import glob
import json
import os
import re


def _load(patterns, fallback):
    out = {}
    for pat in patterns:
        for path in sorted(glob.glob(os.path.expanduser(pat))):
            with open(path) as f:
                d = json.load(f)
            m = re.search(r"_s(\d+)\.json$", path)
            seed = d.get("seed", int(m.group(1)) if m else 0)
            out[int(seed)] = d["val_miou"]
    if fallback and 0 not in out and os.path.exists(fallback):
        with open(fallback) as f:
            out[0] = json.load(f)["val_miou"]
    return out


def main():
    ap = argparse.ArgumentParser()
    # NOTE: argparse appends onto a non-None default, so the defaults
    # are applied after parsing — an explicit --ours/--ref REPLACES them
    ap.add_argument("--ours", action="append", default=None)
    ap.add_argument("--ref", action="append", default=None)
    ap.add_argument("--out", default="SYNTH_SEEDS.json")
    ap.add_argument("--carry-previous", action="store_true",
                    help="keep seeds recorded in the existing "
                         "SYNTH_SEEDS.json that this batch didn't "
                         "re-run")
    args = ap.parse_args()
    if args.ours is None:
        args.ours = ["/tmp/SYNTH_E2E_s*.json"]
    if args.ref is None:
        args.ref = ["/tmp/SYNTH_REF_s*.json"]

    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ours = _load(args.ours, os.path.join(root, "SYNTH_E2E.json"))
    ref = _load(args.ref, os.path.join(root, "SYNTH_E2E_REF.json"))

    # carry seeds from the existing artifact that this batch didn't
    # re-run (valid across rounds while the measured code paths'
    # numerics are unchanged; each value is a finished-run fact)
    prev_path = os.path.join(root, "SYNTH_SEEDS.json")
    if args.carry_previous and os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        for k, v in prev.get("ours_val_miou_by_seed", {}).items():
            ours.setdefault(int(k), v)
        for k, v in prev.get("reference_val_miou_by_seed", {}).items():
            ref.setdefault(int(k), v)

    matched = sorted(set(ours) & set(ref))
    mean = lambda xs: round(sum(xs) / len(xs), 4) if xs else None

    def welch(a, b):
        """95% CI on mean(a) - mean(b), Welch-Satterthwaite dof."""
        import math
        a, b = list(a), list(b)
        na, nb = len(a), len(b)
        if na < 2 or nb < 2:
            return None
        ma, mb = sum(a) / na, sum(b) / nb
        va = sum((x - ma) ** 2 for x in a) / (na - 1)
        vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
        se = math.sqrt(va / na + vb / nb)
        if se == 0:
            # both sample variances 0 (all seed mIoUs identical on each
            # side): the Welch dof is 0/0 — report the degenerate CI
            # instead of crashing (advisor round-3)
            return {"diff_mean": round(ma - mb, 4),
                    "ours_sd": 0.0, "reference_sd": 0.0,
                    "n_ours": na, "n_reference": nb,
                    "se": 0.0, "dof": None, "ci95_halfwidth": 0.0,
                    "ci95": [round(ma - mb, 4), round(ma - mb, 4)]}
        dof = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        # two-sided 97.5% t quantile (Cornish-Fisher from the normal)
        z = 1.959964
        t = z + (z ** 3 + z) / (4 * dof) \
            + (5 * z ** 5 + 16 * z ** 3 + 3 * z) / (96 * dof ** 2)
        return {"diff_mean": round(ma - mb, 4),
                "ours_sd": round(math.sqrt(va), 4),
                "reference_sd": round(math.sqrt(vb), 4),
                "n_ours": na, "n_reference": nb,
                "se": round(se, 4), "dof": round(dof, 1),
                "ci95_halfwidth": round(t * se, 4),
                "ci95": [round(ma - mb - t * se, 4),
                         round(ma - mb + t * se, 4)]}

    result = {
        "ours_val_miou_by_seed": {str(s): ours[s] for s in sorted(ours)},
        "reference_val_miou_by_seed": {str(s): ref[s]
                                       for s in sorted(ref)},
        "matched_seeds": matched,
        "ours_mean_matched": mean([ours[s] for s in matched]),
        "reference_mean_matched": mean([ref[s] for s in matched]),
        "ours_mean_all": mean(list(ours.values())),
        "reference_mean_all": mean(list(ref.values())),
        "welch_ours_minus_reference": welch(list(ours.values()),
                                            list(ref.values())),
        "protocol": (
            "identical synthetic scribble world + flagship recipe "
            "(400 iters, from-scratch, bn momentum 0.1) per seed; ours = "
            "full spml_tpu pipeline on one TPU chip "
            "(pyscripts/misc/synthetic_e2e.py), reference = the torch "
            "code under /root/reference run on CPU "
            "(pyscripts/misc/synthetic_e2e_reference.py). Seeds vary "
            "init/shuffle/augmentation only; the two implementations "
            "draw independent inits, so runs are independent (seed "
            "labels do NOT pair) and the comparison is the Welch CI on "
            "the difference of mean val mIoU."),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
