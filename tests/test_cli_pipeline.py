"""End-to-end CLI-runner pipeline on synthetic data (CPU): prototype
building -> KNN inference -> benchmark, through the same code paths the
pyscripts drive."""

import argparse
import os

import numpy as np
import PIL.Image
import pytest

import jax
import jax.numpy as jnp

from spml_tpu.config import load_config
from spml_tpu.inference import runner


@pytest.fixture
def tiny_world(tmp_path):
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    for sub in ("JPEGImages", "segcls", "seginst"):
        (data / sub).mkdir(parents=True)
    lines = []
    for i in range(3):
        h, w = 48, 64
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        sem = np.zeros((h, w), np.uint8)
        sem[:, w // 2:] = 1 + (i % 2)
        inst = rng.randint(0, 4, (h, w)).astype(np.uint8)
        PIL.Image.fromarray(img).save(data / "JPEGImages" / f"im{i}.jpg")
        PIL.Image.fromarray(sem).save(data / "segcls" / f"im{i}.png")
        PIL.Image.fromarray(inst).save(data / "seginst" / f"im{i}.png")
        lines.append(f"JPEGImages/im{i}.jpg segcls/im{i}.png "
                     f"seginst/im{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    cfg = load_config(overrides={
        "dataset": {"num_classes": 4},
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_iterations": 3,
                    "kmeans_num_clusters": [3, 3]},
        "test": {"image_size": 0, "crop_size": [48, 64],
                 "stride": [48, 64]},
        "tpu": {"compute_dtype": "float32"},
    })
    args = argparse.Namespace(
        snapshot_dir=str(tmp_path / "snap"),  # no checkpoint: random init
        save_dir=str(tmp_path / "out"),
        data_dir=str(data), data_list=str(tmp_path / "list.txt"),
        semantic_memory_dir=str(tmp_path / "out" / "semantic_prototype"),
        cam_dir=None, crf_iter_max=3, crf_pos_w=3, crf_pos_xy_std=1,
        crf_bi_w=4, crf_bi_xy_std=40, crf_bi_rgb_std=5)
    return args, cfg


def test_prototype_then_inference_then_benchmark(tiny_world):
    args, cfg = tiny_world
    runner.run_prototype(args, cfg)
    proto_dir = os.path.join(args.save_dir, "semantic_prototype")
    files = os.listdir(proto_dir)
    assert len(files) == 3
    # tile the memory 10x so top-20 retrieval is dominated by exact
    # self-matches (as with a realistically-sized train split)
    import shutil
    for f in list(files):
        for k in range(9):
            shutil.copy(os.path.join(proto_dir, f),
                        os.path.join(proto_dir, f"{k}_{f}"))

    runner.run_knn_inference(args, cfg)
    gray = os.path.join(args.save_dir, "semantic_gray")
    assert len(os.listdir(gray)) == 3
    pred = np.array(PIL.Image.open(os.path.join(gray, "im0.png")))
    assert pred.shape == (48, 64)
    assert pred.max() < 4

    result = runner.run_benchmark(args, cfg)
    # memory bank built from the SAME images with GT labels: the KNN
    # round trip must beat chance by a wide margin
    assert result["pixel_accuracy"] > 0.5


def test_knn_inference_msc_device_labels(tiny_world):
    """The MSC non-CRF path (device resize+argmax, uint8 download)
    through the full CLI driver: correct shapes, labels in range, and
    accuracy comparable to the single-scale path."""
    args, cfg = tiny_world
    runner.run_prototype(args, cfg)
    args.semantic_memory_dir = os.path.join(args.save_dir,
                                            "semantic_prototype")
    import shutil
    proto_dir = args.semantic_memory_dir
    for f in list(os.listdir(proto_dir)):
        for k in range(9):
            shutil.copy(os.path.join(proto_dir, f),
                        os.path.join(proto_dir, f"{k}_{f}"))
    args.save_dir = args.save_dir + "_msc"
    scales = (0.75, 1.0, 1.25)
    runner.run_knn_inference(args, cfg, msc=True, scales=scales)
    gray = os.path.join(args.save_dir, "semantic_gray")
    assert len(os.listdir(gray)) == 3
    pred = np.array(PIL.Image.open(os.path.join(gray, "im0.png")))
    assert pred.shape == (48, 64)
    assert pred.max() < 4

    # contract: the uint8 device download == downloading the probs and
    # argmaxing on host (MSC accuracy itself is noisy on a random-init
    # tiny model, so equality — not an accuracy bar — is the assertion)
    import spml_tpu.cli as cli_mod
    from spml_tpu.inference import engine as engine_lib
    from spml_tpu.inference import msc as msc_lib
    eng = engine_lib.InferenceEngine(
        cfg, *cli_mod.build_eval_models(cfg, args.snapshot_dir))
    memory = runner._load_memory(args, cfg)
    for _, base, image, _, _ in cli_mod.iterate_test_images(
            cfg, args.data_dir, args.data_list):
        probs = msc_lib.msc_predict_probs_device(
            eng, image, memory, scales=scales, is_flip=True,
            transfer_dtype=np.float32)
        expect = probs.argmax(-1).astype(np.uint8)
        got = np.array(PIL.Image.open(os.path.join(gray, base)))
        np.testing.assert_array_equal(got, expect)
        break


def test_knn_inference_with_crf(tiny_world):
    args, cfg = tiny_world
    runner.run_prototype(args, cfg)
    args.semantic_memory_dir = os.path.join(args.save_dir,
                                            "semantic_prototype")
    args.save_dir = args.save_dir + "_crf"
    runner.run_knn_inference(args, cfg, crf=True)
    assert len(os.listdir(
        os.path.join(args.save_dir, "semantic_gray"))) == 3


def test_pseudo_camrw_pipeline(tiny_world, tmp_path):
    """SEAM-CAM pseudo-label generation: CAM -> stride-8 affinity walk ->
    CRF -> gray/color PNGs."""
    args, cfg = tiny_world
    cam_dir = tmp_path / "cams"
    cam_dir.mkdir()
    rng = np.random.RandomState(0)
    # synth CAMs matching the dataset images (48x64, classes 1..3)
    for i in range(3):
        cam = {0: rng.rand(48, 64).astype(np.float32) * 0.5,
               1: rng.rand(48, 64).astype(np.float32)}
        np.save(cam_dir / f"im{i}.npy", cam, allow_pickle=True)
    args.cam_dir = str(cam_dir)
    args.save_dir = str(tmp_path / "pseudo")
    runner.run_pseudo_camrw_crf(args, cfg)
    gray = os.path.join(args.save_dir, "semantic_gray")
    assert len(os.listdir(gray)) == 3
    pred = np.array(PIL.Image.open(os.path.join(gray, "im1.png")))
    assert pred.shape == (48, 64)
    assert pred.max() < cfg.dataset.num_classes


def test_classifier_snapshot_restore_pulls_frozen_embedding(tmp_path):
    """Stage-2 classifier snapshots hold only the prediction head; the
    embedding must come from network.pretrained (the stage-1 snapshot),
    as in the reference's classifier inference."""
    import jax
    import jax.numpy as jnp

    from spml_tpu import cli
    from spml_tpu.config import load_config
    from spml_tpu.train import classifier_step, step as step_lib
    from spml_tpu.utils import checkpoint as ckpt

    cfg = load_config(overrides={
        "dataset": {"num_classes": 4},
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_num_clusters": [2, 2],
                    "kmeans_iterations": 2},
        "train": {"batch_size": 1, "crop_size": [32, 32],
                  "memory_bank_size": 1},
        "test": {"crop_size": [32, 32], "stride": [32, 32]},
        "tpu": {"compute_dtype": "float32", "segment_capacity": 16},
    })
    # stage-1 snapshot (full state)
    s1 = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))
    ckpt.save(str(tmp_path / "stage1" / "checkpoints"), 1, s1)
    # stage-2 snapshot (classifier only)
    s2 = classifier_step.init_classifier_state(
        cfg, jax.random.PRNGKey(1), cfg.network.embedding_dim)
    ckpt.save(str(tmp_path / "cls" / "checkpoints"), 1, s2)

    cfg.network.pretrained = str(tmp_path / "stage1")
    emb_model, evars, cls_model, cvars = cli.build_eval_models(
        cfg, str(tmp_path / "cls"), with_classifier=True)
    # embedding params came from stage-1, classifier from stage-2
    want_emb = s1.params["embedding"]
    got_emb = evars["params"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(want_emb)[0]),
        np.asarray(jax.tree.leaves(got_emb)[0]))
    want_cls = s2.params["prediction"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(want_cls)[0]),
        np.asarray(jax.tree.leaves(cvars["params"])[0]))


def test_pseudo_densepose_pipeline(tmp_path):
    """DensePose point pseudo labels: cluster with 'unknown' class,
    NN label propagation, walk, CRF, ignore re-mask."""
    import argparse

    from spml_tpu.config import load_config

    rng = np.random.RandomState(1)
    data = tmp_path / "data"
    for sub in ("JPEGImages", "points", "seginst"):
        (data / sub).mkdir(parents=True)
    lines = []
    for i in range(2):
        h, w = 64, 64
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        # sparse point labels among 15 classes, 255 elsewhere
        pts = np.full((h, w), 255, np.uint8)
        ys, xs = rng.randint(0, h, 30), rng.randint(0, w, 30)
        pts[ys, xs] = rng.randint(0, 15, 30)
        inst = rng.randint(0, 6, (h, w)).astype(np.uint8)
        PIL.Image.fromarray(img).save(data / "JPEGImages" / f"p{i}.jpg")
        PIL.Image.fromarray(pts).save(data / "points" / f"p{i}.png")
        PIL.Image.fromarray(inst).save(data / "seginst" / f"p{i}.png")
        lines.append(f"JPEGImages/p{i}.jpg points/p{i}.png "
                     f"seginst/p{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    cfg = load_config(overrides={
        "dataset": {"num_classes": 15},
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_iterations": 2,
                    "kmeans_num_clusters": [3, 3]},
        "test": {"image_size": 0, "crop_size": [64, 64],
                 "stride": [64, 64]},
        "tpu": {"compute_dtype": "float32", "segment_capacity": 64},
    })
    args = argparse.Namespace(
        snapshot_dir=str(tmp_path / "none"),
        save_dir=str(tmp_path / "out"),
        data_dir=str(data), data_list=str(tmp_path / "list.txt"),
        semantic_memory_dir=None, cam_dir=None,
        crf_iter_max=2, crf_pos_w=3, crf_pos_xy_std=1, crf_bi_w=4,
        crf_bi_xy_std=20, crf_bi_rgb_std=5)
    runner.run_pseudo_densepose(args, cfg)
    gray = os.path.join(args.save_dir, "semantic_gray")
    assert len(os.listdir(gray)) == 2
    pred = np.array(PIL.Image.open(os.path.join(gray, "p0.png")))
    assert pred.shape == (64, 64)
    # originally-ignored pixels (not points) stay 255; points area labeled
    pts = np.array(PIL.Image.open(data / "points" / "p0.png"))
    assert (pred[pts == 255] == 255).all()
    assert (pred[pts != 255] < 15).all()
