"""The multi-seed aggregator's Welch statistics and carry-previous
merge (pyscripts/misc/aggregate_synth_seeds.py) — this produces the
headline mIoU-parity artifact (SYNTH_SEEDS.json), so its math is
locked here against hand-computed values.
"""

import importlib.util
import json
import math
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "pyscripts", "misc",
                      "aggregate_synth_seeds.py")


def _run(tmp_path, ours, ref, prev=None, carry=False):
    for seed, v in ours.items():
        with open(tmp_path / f"OURS_s{seed}.json", "w") as f:
            json.dump({"seed": seed, "val_miou": v}, f)
    for seed, v in ref.items():
        with open(tmp_path / f"REF_s{seed}.json", "w") as f:
            json.dump({"seed": seed, "val_miou": v}, f)
    out = tmp_path / "SEEDS.json"
    cmd = [sys.executable, SCRIPT,
           "--ours", str(tmp_path / "OURS_s*.json"),
           "--ref", str(tmp_path / "REF_s*.json"),
           "--out", str(out)]
    if carry:
        cmd.append("--carry-previous")
    env = dict(os.environ)
    cwd = str(tmp_path)
    if prev is not None:
        with open(tmp_path / "SYNTH_SEEDS.json", "w") as f:
            json.dump(prev, f)
    # run from tmp_path is not enough: the script resolves the previous
    # artifact relative to its own location (the repo root), so carry
    # tests monkey-load the module instead
    if carry:
        spec = importlib.util.spec_from_file_location("agg", SCRIPT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ours_d = mod._load([str(tmp_path / "OURS_s*.json")], None)
        for k, v in (prev or {}).get("ours_val_miou_by_seed",
                                     {}).items():
            ours_d.setdefault(int(k), v)
        return ours_d
    subprocess.run(cmd, check=True, cwd=cwd, env=env,
                   stdout=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


def test_welch_ci_matches_hand_computation(tmp_path):
    ours = {0: 0.50, 1: 0.40, 2: 0.45, 3: 0.55}
    ref = {0: 0.42, 1: 0.38, 2: 0.40}
    d = _run(tmp_path, ours, ref)
    w = d["welch_ours_minus_reference"]

    ma = sum(ours.values()) / 4
    mb = sum(ref.values()) / 3
    va = sum((x - ma) ** 2 for x in ours.values()) / 3
    vb = sum((x - mb) ** 2 for x in ref.values()) / 2
    se = math.sqrt(va / 4 + vb / 3)
    dof = (va / 4 + vb / 3) ** 2 / (
        (va / 4) ** 2 / 3 + (vb / 3) ** 2 / 2)

    assert w["n_ours"] == 4 and w["n_reference"] == 3
    assert abs(w["diff_mean"] - (ma - mb)) < 1e-4
    assert abs(w["se"] - se) < 1e-4
    assert abs(w["dof"] - dof) < 0.1
    # the t quantile must exceed the normal z and shrink toward it as
    # dof grows; for dof~4.9 t_(97.5%) ~ 2.57 (table value 2.571 at 5)
    t_eff = w["ci95_halfwidth"] / w["se"]
    assert 2.3 < t_eff < 2.9
    assert abs((w["ci95"][0] + w["ci95"][1]) / 2 - w["diff_mean"]) < 1e-3
    # matched-seed means use the intersection {0,1,2}
    assert d["matched_seeds"] == [0, 1, 2]
    assert abs(d["ours_mean_matched"] - 0.45) < 1e-6


def test_carry_previous_keeps_unrerun_seeds(tmp_path):
    prev = {"ours_val_miou_by_seed": {"0": 0.30, "7": 0.70},
            "reference_val_miou_by_seed": {"0": 0.35}}
    ours_d = _run(tmp_path, {0: 0.50}, {}, prev=prev, carry=True)
    # fresh batch wins for seed 0; seed 7 carried from the artifact
    assert ours_d[0] == 0.50
    assert ours_d[7] == 0.70
