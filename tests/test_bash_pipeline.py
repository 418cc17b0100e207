"""Dress rehearsal of the ACTUAL bash pipeline: runs
bashscripts/voc12/train_spml_scribble.sh (the real `source`-able script,
reference surface: twke18/SPML bashscripts/voc12/train_spml_scribble.sh)
end-to-end on a fake VOC12 world with tiny settings, on CPU.

This is the only place the sed config rendering, env-var surface, CLI
flag passing, stage file-layout handoffs (stage1 -> prototype ->
inference -> benchmark -> pseudo-label rewrite -> classifier ->
inference -> benchmark) and the subprocess entry points are exercised
exactly as a user would run them. The Python-level chain tests
(test_cli_pipeline.py etc.) cover the algorithms; this covers the glue.

Each stage is a separate python3 process; SPML_TPU_PLATFORM=cpu pins
them to the CPU backend (JAX_PLATFORMS is dead under a sitecustomize
that pre-imports jax)."""

import os
import subprocess

import numpy as np
import PIL.Image
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_IDS = [f"2007_{i:06d}" for i in range(6)]
VAL_IDS = [f"2008_{i:06d}" for i in range(2)]


def _world(tmp_path):
    """Fake VOCdevkit: JPEGs, dense GT segcls, sparse scribbles (the
    reference's scribble_annotation/VOC2012/dilate_3/segcls layout so
    the pseudo-label sed rewrite matches), hed 'instance' maps."""
    rng = np.random.RandomState(0)
    root = tmp_path / "VOCdevkit"
    jpg = root / "VOC2012" / "JPEGImages"
    gt = root / "VOC2012" / "segcls"
    hed = root / "VOC2012" / "hed"
    scr = root / "scribble_annotation" / "VOC2012" / "dilate_3" / "segcls"
    for d in (jpg, gt, hed, scr):
        d.mkdir(parents=True)
    for k, name in enumerate(TRAIN_IDS + VAL_IDS):
        h, w = 48, 64
        # two-class world with a position cue: left half class a,
        # right half class b; image intensity correlates with class
        a, b = 1 + (k % 3), 4 + (k % 3)
        sem = np.zeros((h, w), np.uint8)
        sem[:, : w // 2] = a
        sem[:, w // 2:] = b
        img = np.stack([np.full((h, w), 40 * a, np.uint8),
                        np.full((h, w), 40 * b, np.uint8),
                        rng.randint(0, 255, (h, w), dtype=np.uint8)], -1)
        scribble = np.full((h, w), 255, np.uint8)
        scribble[h // 2 - 2: h // 2 + 2, 4: w // 2 - 4] = a
        scribble[h // 2 - 2: h // 2 + 2, w // 2 + 4: -4] = b
        inst = ((np.arange(h)[:, None] // 16) * 4
                + np.arange(w)[None, :] // 16).astype(np.uint8)
        PIL.Image.fromarray(img).save(jpg / f"{name}.jpg", quality=95)
        PIL.Image.fromarray(sem).save(gt / f"{name}.png")
        PIL.Image.fromarray(inst).save(hed / f"{name}.png")
        PIL.Image.fromarray(scribble).save(scr / f"{name}.png")

    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "scribble.txt").write_text("".join(
        f"VOC2012/JPEGImages/{n}.jpg "
        f"scribble_annotation/VOC2012/dilate_3/segcls/{n}.png "
        f"VOC2012/hed/{n}.png\n" for n in TRAIN_IDS))
    (lists / "memory.txt").write_text("".join(
        f"VOC2012/JPEGImages/{n}.jpg VOC2012/segcls/{n}.png "
        f"VOC2012/hed/{n}.png\n" for n in TRAIN_IDS))
    (lists / "val.txt").write_text("".join(
        f"VOC2012/JPEGImages/{n}.jpg VOC2012/segcls/{n}.png "
        f"VOC2012/segcls/{n}.png\n" for n in VAL_IDS))
    return root, lists


def test_scribble_bash_pipeline(tmp_path):
    dataroot, lists = _world(tmp_path)
    snap = tmp_path / "snap"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "SPML_TPU_PLATFORM": "cpu",
        "DATAROOT": str(dataroot),
        "SNAPSHOT_DIR": str(snap),
        "TRAIN_DATA_LIST": str(lists / "scribble.txt"),
        "MEMORY_DATA_LIST": str(lists / "memory.txt"),
        "TEST_DATA_LIST": str(lists / "val.txt"),
        "PRETRAINED": str(tmp_path / "no_pretrained.pth"),  # from scratch
        # tiny network / schedule
        "BACKBONE_TYPES": "panoptic_deeplab_10",
        "EMBEDDING_DIM": "8",
        "CROP_SIZE": "32",
        "BATCH_SIZE": "2",
        "MAX_ITERATION": "3",
        "SNAPSHOT_STEP": "3",
        "WARMUP_ITERATION": "1",
        "MEMORY_BANK_SIZE": "1",
        "KMEANS_ITERATIONS": "2",
        "KMEANS_NUM_CLUSTERS": "2",
        "CLS_BATCH_SIZE": "2",
        "CLS_MAX_ITERATION": "3",
        # inference at native 48x64, single window
        "INFERENCE_IMAGE_SIZE": "0",
        "INFERENCE_CROP_SIZE_H": "48",
        "INFERENCE_CROP_SIZE_W": "64",
        "INFERENCE_STRIDE": "64",
    })
    proc = subprocess.run(
        ["bash", "-ec", "source bashscripts/voc12/train_spml_scribble.sh"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1700)
    tail = proc.stdout[-4000:] + "\n--- stderr ---\n" + proc.stderr[-4000:]
    assert proc.returncode == 0, tail

    # stage handoffs left the layout the reference's tooling expects
    assert (snap / "config_emb.yaml").exists()
    assert (snap / "config_classifier.yaml").exists()
    for vid in VAL_IDS:
        assert (snap / "stage1" / "results" / "val" / "semantic_gray"
                / f"{vid}.png").exists()
        assert (snap / "softmax_classifier_stage1" / "results" / "val"
                / "semantic_gray" / f"{vid}.png").exists()
    # pseudo-label stage produced labels + the rewritten train list
    pseudo = snap / "stage1" / "pseudo_labels" / "train+_cam_rw"
    rewritten = (pseudo / "list.txt").read_text().splitlines()
    assert len(rewritten) == len(TRAIN_IDS)
    img_path, label_path = rewritten[0].split(" ")[:2]
    assert label_path.startswith(str(pseudo / "semantic_gray"))
    assert os.path.exists(label_path)
    assert img_path.startswith(str(dataroot))
    # benchmarks ran (knn, softmax, pseudo) and printed their scores
    assert proc.stdout.count("mean IOU") >= 3, tail
