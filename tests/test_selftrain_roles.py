"""Unit tests for selftrain_from_drill.py's row-role mapping and
--merge note handling (round-4 advisor items: a results/train bench
must not masquerade as the val chain row; --merge must not drop
previously recorded notes)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "pyscripts", "misc"))

import selftrain_from_drill as sfd  # noqa: E402


@pytest.mark.parametrize("label,expected", [
    ("benchmark_by_mIoU:snap/stage1/results/val", "stage1:knn:val"),
    ("benchmark_by_mIoU:snap/stage1/results/val_softmax",
     "stage1:softmax:val"),
    ("benchmark_by_mIoU:snap/softmax_classifier_stage1/results/val",
     "softmax_classifier_stage1:classifier:val"),
    # held-out splits other than 'val' normalize to the :val role
    ("benchmark_by_mIoU:snap/stage1/results/minival2014",
     "stage1:knn:val"),
    # a NON-held-out split keeps its own name (no silent collision
    # with the real val row)
    ("benchmark_by_mIoU:snap/stage1/results/train",
     "stage1:knn:train"),
    ("benchmark_by_mIoU:snap/stage1/results/train_softmax",
     "stage1:softmax:train"),
    ("benchmark_by_mIoU:snap/stage1/pseudo_labels/train+_cam_rw",
     "stage1:pseudo:train+_cam_rw"),
])
def test_role(label, expected):
    assert sfd._role(label) == expected


def _drill(tmp_path, miou):
    d = {"world": {"n_train": 1}, "config": {},
         "pipelines": [{"pipeline": "scribble", "stages": [
             {"stage": "benchmark_by_mIoU:s/stage1/results/val",
              "mean_iou": miou}]}]}
    p = tmp_path / "drill.json"
    p.write_text(json.dumps(d))
    return str(p)


def test_merge_keeps_previous_notes(tmp_path):
    out = str(tmp_path / "out.json")
    script = os.path.join(ROOT, "pyscripts", "misc",
                          "selftrain_from_drill.py")
    subprocess.run(
        [sys.executable, script, "--drill", _drill(tmp_path, 0.5),
         "--out", out, "--note", "scribble=first-note"],
        check=True, capture_output=True)
    # re-extract with --merge and no --note: the note must survive
    subprocess.run(
        [sys.executable, script, "--drill", _drill(tmp_path, 0.6),
         "--out", out, "--merge"],
        check=True, capture_output=True)
    with open(out) as f:
        d = json.load(f)
    entry = d["pipelines"]["scribble"]
    assert entry["notes"] == ["first-note"]
    assert entry["val_chain"]["stage1:knn:val"] == 0.6
    # a new note appends without duplicating
    subprocess.run(
        [sys.executable, script, "--drill", _drill(tmp_path, 0.6),
         "--out", out, "--merge", "--note", "scribble=second-note",
         "--note", "scribble=first-note"],
        check=True, capture_output=True)
    with open(out) as f:
        d = json.load(f)
    assert d["pipelines"]["scribble"]["notes"] == [
        "first-note", "second-note"]
