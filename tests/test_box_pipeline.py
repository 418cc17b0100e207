"""End-to-end CAM-seeded pseudo-label chain (IS_ANNOTATION_1 in
bashscripts/voc12/train_spml_tag.sh, reference train_spml_tag.sh:210-287
— the box pipeline itself seeds from pseudo_softmaxrw_crf instead,
reference train_spml_box.sh:150-175):
SEAM CAM seeds -> pseudo_camrw_crf (flip-averaged affinity walk + CRF)
-> bash list rewrite -> prototype_msc over the pseudo labels ->
pseudo_inference_crf_msc -> classifier stage-1 training.

The tag round-2 test already drives prototype_msc ->
pseudo_inference_crf_msc -> classifier; what is unique here is the CAM
.npy entry point and its handoff into the rewritten list, so this test
runs the full chain from synthetic CAM seeds.
"""

import argparse
import os

import numpy as np
import PIL.Image
import pytest

import jax
import jax.numpy as jnp

from spml_tpu.config import load_config
from spml_tpu.inference import runner
from spml_tpu.train import driver, step as step_lib
from spml_tpu.utils import checkpoint as ckpt


@pytest.fixture
def box_world(tmp_path):
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    for sub in ("JPEGImages", "segcls", "seginst"):
        (data / sub).mkdir(parents=True)
    cam_dir = tmp_path / "cam"
    cam_dir.mkdir()
    lines = []
    h, w = 48, 64
    for i in range(3):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        # box-supervision ground truth: the list's label column carries
        # the SEAM-seeded annotation (here: a half-image box)
        sem = np.zeros((h, w), np.uint8)
        sem[:, w // 2:] = 1 + (i % 2)
        inst = rng.randint(0, 4, (h, w)).astype(np.uint8)
        PIL.Image.fromarray(img).save(data / "JPEGImages" / f"im{i}.jpg")
        PIL.Image.fromarray(sem).save(data / "segcls" / f"im{i}.png")
        PIL.Image.fromarray(inst).save(data / "seginst" / f"im{i}.png")
        lines.append(f"data/JPEGImages/im{i}.jpg data/segcls/im{i}.png "
                     f"data/seginst/im{i}.png")
        # SEAM CAM dict: 0-based foreground class -> [h, w] scores
        # (cam class k == semantic class k+1, pseudo_camrw_crf.py:103-112)
        fg = np.zeros((h, w), np.float32)
        fg[:, w // 2:] = 0.9
        np.save(cam_dir / f"im{i}.npy", {i % 2: fg}, allow_pickle=True)
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    cfg = load_config(overrides={
        "dataset": {"num_classes": 4},
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_iterations": 2,
                    "kmeans_num_clusters": [2, 2]},
        "train": {"batch_size": 1, "crop_size": [32, 32],
                  "memory_bank_size": 0, "max_iteration": 2,
                  "snapshot_step": 2, "tensorboard_step": 1,
                  "random_crop": True, "random_mirror": True,
                  "random_scale": False, "shuffle": True},
        "test": {"image_size": 0, "crop_size": [48, 64],
                 "stride": [48, 64]},
        "tpu": {"compute_dtype": "float32", "segment_capacity": 32},
    })
    stage1 = tmp_path / "stage1"
    s1 = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))
    ckpt.save(str(stage1 / "checkpoints"), 1, s1)
    cfg.network.pretrained = str(stage1)
    return tmp_path, cfg, str(cam_dir)


def test_box_chain(box_world):
    tmp_path, cfg, cam_dir = box_world
    data_dir = str(tmp_path)
    train_list = str(tmp_path / "list.txt")
    stage1 = str(tmp_path / "stage1")

    def mkargs(**kw):
        base = dict(snapshot_dir=None, save_dir=None, data_dir=data_dir,
                    data_list=train_list, semantic_memory_dir=None,
                    cam_dir=cam_dir, crf_iter_max=2, crf_pos_w=3,
                    crf_pos_xy_std=1, crf_bi_w=4, crf_bi_xy_std=20,
                    crf_bi_rgb_std=5)
        base.update(kw)
        return argparse.Namespace(**base)

    # -- 1) CAM + affinity random walk + CRF -> round-1 pseudo labels
    pseudo1 = str(tmp_path / "stage1" / "pseudo_labels" / "cam_rw")
    runner.run_pseudo_camrw_crf(
        mkargs(snapshot_dir=stage1, save_dir=pseudo1), cfg)
    gray1 = os.path.join(pseudo1, "semantic_gray")
    assert len(os.listdir(gray1)) == 3
    for i in range(3):
        p = np.array(PIL.Image.open(os.path.join(gray1, f"im{i}.png")))
        assert p.shape == (48, 64) and p.max() < 4
    # the 0.9-CAM half-box must dominate its side of the image: the
    # walked+CRF'd labels keep the seeded class somewhere in the box
    p = np.array(PIL.Image.open(os.path.join(gray1, "im0.png")))
    assert (p[:, 32:] == 1).any()

    # -- 2) the bash list rewrite (train_spml_box.sh:196-198)
    rel = os.path.relpath(gray1, data_dir)
    lines = [f"data/JPEGImages/im{i}.jpg {rel}/im{i}.png "
             f"data/seginst/im{i}.png" for i in range(3)]
    pseudo_list = str(tmp_path / "stage1" / "pseudo_labels" / "list.txt")
    with open(pseudo_list, "w") as f:
        f.write("\n".join(lines) + "\n")

    # -- 3) prototype_msc over the camrw pseudo labels
    pseudo_nn = str(tmp_path / "stage1" / "pseudo_labels" / "cam_nn")
    runner.run_prototype(
        mkargs(snapshot_dir=stage1, save_dir=pseudo_nn,
               data_list=pseudo_list),
        cfg, scales=[0.5, 1.0], save_clusters=False)
    proto_dir = os.path.join(pseudo_nn, "semantic_prototype")
    assert len(os.listdir(proto_dir)) == 3

    # -- 4) pseudo_inference_crf_msc -> the classifier training labels
    runner.run_pseudo_knn(
        mkargs(snapshot_dir=stage1, save_dir=pseudo_nn,
               semantic_memory_dir=proto_dir),
        cfg, scales=(0.5, 1.0), with_crf=True)
    gray_nn = os.path.join(pseudo_nn, "semantic_gray")
    assert len(os.listdir(gray_nn)) == 3

    # -- 5) classifier stage 1 on the NN-refined pseudo labels
    rel_nn = os.path.relpath(gray_nn, data_dir)
    lines = [f"data/JPEGImages/im{i}.jpg {rel_nn}/im{i}.png "
             f"data/seginst/im{i}.png" for i in range(3)]
    nn_list = str(tmp_path / "stage1" / "pseudo_labels" / "nn_list.txt")
    with open(nn_list, "w") as f:
        f.write("\n".join(lines) + "\n")

    cls1 = str(tmp_path / "softmax_classifier_stage1")
    state = driver.train_classifier(
        mkargs(snapshot_dir=cls1, data_list=nn_list), cfg)
    assert int(state.step) == cfg.train.max_iteration
    assert ckpt.latest_step(os.path.join(cls1, "checkpoints")) == \
        cfg.train.max_iteration
