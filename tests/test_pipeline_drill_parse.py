"""The pipeline-drill harness's stage-timing parse and mIoU folding.

Guards the alignment rule: BOTH pyscripts/benchmark/benchmark_by_mIoU.py
and benchmark_by_instance.py print exactly one "mean IOU:" line, so the
stdout mIoUs must fold over both benchmark kinds in stage order —
folding over only the mIoU stages misaligns every value after the first
instance benchmark (the round-3 bug this test locks).
"""

import hashlib
import importlib.util
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_drill():
    spec = importlib.util.spec_from_file_location(
        "pipeline_drill",
        os.path.join(ROOT, "pyscripts", "misc", "pipeline_drill.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_timing_parse_and_miou_fold(tmp_path):
    pd = _load_drill()
    log = tmp_path / "timing.log"
    lines = []
    t = 1000.0

    def stage(argv, secs, nc0, nc1):
        # current shim format (resume-capable): ts KIND md5(argv) ...
        nonlocal t
        key = hashlib.md5(argv.encode()).hexdigest()
        lines.append(f"{t:.9f} START {key} {nc0} {argv}")
        t += secs
        lines.append(f"{t:.9f} END {key} 0:{nc1} {argv}")

    stage("pyscripts/train/train.py --snapshot_dir /s/stage1", 60.0, 0, 4)
    stage("pyscripts/benchmark/benchmark_by_mIoU.py "
          "--pred_dir /s/stage1/results/val/semantic_gray", 2.0, 4, 4)
    stage("pyscripts/benchmark/benchmark_by_instance.py "
          "--pred_dir /s/stage1/results/val/semantic_gray", 2.0, 4, 4)
    stage("pyscripts/benchmark/benchmark_by_mIoU.py "
          "--pred_dir /s/cls_stage1/results/val/semantic_gray", 2.0, 4, 4)
    log.write_text("\n".join(lines) + "\n")

    stages = pd._parse_timing(str(log))
    assert [s["stage"] for s in stages] == [
        "train:stage1",
        "benchmark_by_mIoU:stage1/results/val",
        "benchmark_by_instance:stage1/results/val",
        "benchmark_by_mIoU:cls_stage1/results/val",
    ]
    assert stages[0]["seconds"] == 60.0
    assert stages[0]["new_xla_compiles"] == 4

    # fold exactly as run_pipeline does: stdout prints one mean IOU per
    # benchmark of EITHER kind, in stage order
    stdout = ("mean IOU: 50.0000%\n"   # stage1 val (mIoU)
              "mean IOU: 40.0000%\n"   # stage1 val (instance)
              "mean IOU: 60.0000%\n")  # cls_stage1 val (mIoU)
    mious = [float(m) / 100 for m in
             re.findall(r"mean IOU: *([0-9.]+)%", stdout)]
    bench = [s for s in stages if s["stage"].startswith("benchmark_by_")]
    for st, miou in zip(bench, mious):
        st["mean_iou"] = miou

    by_label = {s["stage"]: s.get("mean_iou") for s in stages}
    assert by_label["benchmark_by_mIoU:stage1/results/val"] == 0.5
    assert by_label["benchmark_by_instance:stage1/results/val"] == 0.4
    assert by_label["benchmark_by_mIoU:cls_stage1/results/val"] == 0.6

    # resume replay: a rerun appends SKIP lines for cached stages; the
    # parser must keep the ORIGINAL timing and mark them resumed
    argv0 = "pyscripts/train/train.py --snapshot_dir /s/stage1"
    key0 = hashlib.md5(argv0.encode()).hexdigest()
    with open(log) as f:
        contents = f.read()
    (log).write_text(contents + f"{t:.9f} SKIP {key0} {argv0}\n")
    stages2 = pd._parse_timing(str(log))
    assert [s["stage"] for s in stages2] == [s["stage"] for s in stages]
    assert stages2[0]["seconds"] == 60.0
    assert stages2[0]["resumed_from_cache"] is True
    assert "resumed_from_cache" not in stages2[1]
