"""The list generators must reproduce the reference's shipped dataset
lists line-for-line (given the same image ids).

Oracle: the actual files under /root/reference/datasets/ — we extract
the ids from each reference list's image column, feed them to our
generator, and require exact line equality.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REFERENCE = "/root/reference/datasets"
ROOT = os.path.join(os.path.dirname(__file__), "..")

if not os.path.isdir(REFERENCE):
    pytest.skip("reference checkout not available", allow_module_level=True)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_lines(name, sub="voc12", limit=50):
    with open(os.path.join(REFERENCE, sub, name)) as f:
        return [line.rstrip("\n") for line in f][:limit]


def _ids_from(lines):
    return [os.path.splitext(os.path.basename(l.split()[0]))[0]
            for l in lines]


VOC_TRAIN_LISTS = [
    "scribble_train+_d3_hed.txt",
    "scribble_train+_d3_0.3_hed.txt",
    "scribble_train+_d3_0.5_hed.txt",
    "scribble_train+_d3_0.8_hed.txt",
    "scribble_train+_d6_0.0_hed.txt",
    "seam_train+_a6_th0.2_hed.txt",
    "seambox_train+_a6_th0.5_hed.txt",
    "panoptic_train+_hed.txt",
]


@pytest.mark.parametrize("name", VOC_TRAIN_LISTS)
def test_voc12_train_list_format(name):
    gen = _load("pyscripts/misc/make_voc12_lists.py", "make_voc12_lists")
    ref = _ref_lines(name)
    tmpl = name.replace("train+", "{split}")
    got = gen.voc12_lines(tmpl, _ids_from(ref), "train+")
    assert got == ref


def test_voc12_val_list_format():
    gen = _load("pyscripts/misc/make_voc12_lists.py", "make_voc12_lists")
    ref = _ref_lines("panoptic_val.txt")
    got = gen.voc12_lines("panoptic_{split}.txt", _ids_from(ref), "val")
    assert got == ref


def test_voc12_cli_end_to_end(tmp_path):
    """Drive the CLI against a synthetic VOCdevkit split layout and
    compare every produced list against the reference head."""
    ids = _ids_from(_ref_lines("scribble_train+_d3_hed.txt"))
    val_ids = _ids_from(_ref_lines("val.txt"))
    root = tmp_path / "VOCdevkit"
    (root / "VOC2012/ImageSets/SegmentationAug").mkdir(parents=True)
    (root / "VOC2012/ImageSets/Segmentation").mkdir(parents=True)
    (root / "VOC2012/ImageSets/SegmentationAug/trainaug.txt").write_text(
        "\n".join(ids) + "\n")
    (root / "VOC2012/ImageSets/Segmentation/val.txt").write_text(
        "\n".join(val_ids) + "\n")
    out = tmp_path / "lists"
    subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "pyscripts/misc/make_voc12_lists.py"),
         "--voc_root", str(root), "--out_dir", str(out),
         "--splits", "train+,val"],
        check=True, capture_output=True)

    for name in VOC_TRAIN_LISTS:
        got = (out / name).read_text().splitlines()
        assert got == _ref_lines(name), name
    assert (out / "panoptic_val.txt").read_text().splitlines() == \
        _ref_lines("panoptic_val.txt")
    assert (out / "val.txt").read_text().splitlines() == \
        _ref_lines("val.txt")
    assert (out / "val_id.txt").read_text().splitlines() == \
        _ref_lines("val_id.txt")
    assert (out / "train+.txt").read_text().splitlines() == \
        _ref_lines("train+.txt")


def test_densepose_list_format():
    gen = _load("pyscripts/misc/make_densepose_lists.py",
                "make_densepose_lists")
    for name, split in [("panoptic_minival2014.txt", "val2014"),
                        ("panoptic_train2014_sub.txt", "train2014"),
                        ("panoptic_valminusminival2014.txt", "val2014")]:
        ref = _ref_lines(name, sub="densepose")
        got = gen.densepose_lines(_ids_from(ref), split)
        assert got == ref, name
