"""End-to-end DensePose-variant validation on a synthetic POINT world.

The scribble world (synthetic_e2e.py) proves the flagship DeepLab path;
this proves the DensePose family end-to-end on the device: the
pspnet+color-LFN embedding model, the DenseposeTagDataset left/right
label remap under mirroring, POINT supervision (sparse labeled pixels,
255 elsewhere), the NN-propagated-tag feat_aff loss (reference
segsort_softmax_densepose.py:174-193), and the no-memory-bank recipe
(bashscripts/densepose/train_spml_point.sh:14-44).

Figures have a left/right hand pair with IDENTICAL appearance (like
real anatomy), distinguishable only by pose context: the head sits
offset toward the figure's anatomical right, so a hand's laterality is
inferable from which side of the head it is on. Random mirroring MUST
remap labels 2<->3 to keep that context consistent — if the remap were
missing or inverted, hand labels would be anti-correlated with context
on half the samples and both hand classes would collapse; the remap's
correctness is observable in the final mIoU, not just a unit test.
(An earlier version colored the two hands differently and kept the
figure symmetric — that makes laterality information-theoretically
unlearnable under mirroring: color is 50/50 re-labeled and there is no
other cue, so KNN ties broke to the lower class id and 'left hand'
scored 0. See DENSEPOSE_E2E history.)

Pipeline: point training from random init -> memory-bank prototypes
over the train split (dense labels, as the reference builds prototypes
from its stage-2 dense pseudo labels) -> KNN inference on held-out val
-> mIoU over the present classes. Writes DENSEPOSE_E2E.json.

Usage: python pyscripts/misc/synthetic_densepose_e2e.py [--iters 400]
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import PIL.Image

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)

N_CLASSES = 15  # the DensePose 15-part label space (remap table size)
SIZE = 160
# class ids (densepose naming): 1 torso, 2 right hand, 3 left hand,
# 14 head
# both hands share a color: laterality must come from pose context
PART_COLORS = {0: [45, 85, 55], 1: [200, 60, 60], 2: [60, 80, 200],
               3: [60, 80, 200], 14: [150, 70, 180]}


def _points(rng, sem, per_class=12, block=2):
    """Sparse point annotation: 255 everywhere except small blocks at
    sampled in-class locations (DensePose point supervision)."""
    out = np.full_like(sem, 255)
    for cls in np.unique(sem):
        ys, xs = np.nonzero(sem == cls)
        if len(ys) == 0:
            continue
        take = rng.choice(len(ys), min(per_class, len(ys)),
                          replace=False)
        for t in take:
            y, x = ys[t], xs[t]
            sl = (slice(max(0, y - block), y + block + 1),
                  slice(max(0, x - block), x + block + 1))
            out[sl] = np.where(sem[sl] == cls, cls, out[sl])
    return out


def make_world(root, rng, n_train=48, n_val=12):
    for sub in ("JPEGImages", "segcls", "seginst", "points"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    train_lines, val_lines, dense_train_lines = [], [], []
    yy, xx = np.mgrid[:SIZE, :SIZE]
    for i in range(n_train + n_val):
        is_train = i < n_train
        sem = np.zeros((SIZE, SIZE), np.uint8)
        inst = np.zeros((SIZE, SIZE), np.uint8)
        # one "figure": torso ellipse, head above OFFSET to the
        # figure's right (the asymmetry cue), right hand on the
        # figure's right (image LEFT), left hand on the image RIGHT —
        # mirroring must swap 2<->3 to stay anatomically consistent
        cy = rng.randint(70, SIZE - 50)
        cx = rng.randint(55, SIZE - 55)
        torso = (((yy - cy) / 28.0) ** 2 + ((xx - cx) / 16.0) ** 2) < 1
        head = ((yy - (cy - 38)) ** 2 + (xx - (cx - 14)) ** 2) < 13 ** 2
        rhand = ((yy - (cy - 8)) ** 2 + (xx - (cx - 28)) ** 2) < 11 ** 2
        lhand = ((yy - (cy - 8)) ** 2 + (xx - (cx + 28)) ** 2) < 11 ** 2
        for cls, m in ((1, torso), (14, head), (2, rhand), (3, lhand)):
            sem[m] = cls
            inst[m] = 1
        img = np.zeros((SIZE, SIZE, 3), np.float32)
        for cls, col in PART_COLORS.items():
            img[sem == cls] = col
        img += rng.randn(SIZE, SIZE, 3) * 16
        img += (np.sin(yy / 8.0) * 5 + np.cos(xx / 11.0) * 5)[..., None]
        img = np.clip(img, 0, 255).astype(np.uint8)

        pts = _points(rng, sem)

        base = f"im{i:03d}"
        PIL.Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", base + ".jpg"), quality=95)
        PIL.Image.fromarray(sem).save(
            os.path.join(root, "segcls", base + ".png"))
        PIL.Image.fromarray(inst).save(
            os.path.join(root, "seginst", base + ".png"))
        PIL.Image.fromarray(pts).save(
            os.path.join(root, "points", base + ".png"))
        if is_train:
            train_lines.append(f"JPEGImages/{base}.jpg "
                               f"points/{base}.png seginst/{base}.png")
            dense_train_lines.append(
                f"JPEGImages/{base}.jpg segcls/{base}.png "
                f"seginst/{base}.png")
        else:
            val_lines.append(f"JPEGImages/{base}.jpg segcls/{base}.png "
                             f"seginst/{base}.png")
    for name, lines in (("train.txt", train_lines),
                        ("train_dense.txt", dense_train_lines),
                        ("val.txt", val_lines)):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--root", default="/tmp/synth_densepose")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-fused", action="store_true",
                    help="XLA loss instead of Pallas (CPU smoke)")
    ap.add_argument("--apply-feat-aff", action="store_true",
                    help="tpu.apply_feat_aff=true: the paper-semantics "
                         "feat_aff term (default reproduces the "
                         "reference's EFFECTIVE objective, which never "
                         "invokes it)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from spml_tpu.config import load_config
    from spml_tpu.data import datasets
    from spml_tpu.inference import runner
    from spml_tpu.train import driver

    rng = np.random.RandomState(11)
    root = args.root
    make_world(root, rng)

    # the reference densepose recipe scaled to the synthetic world:
    # pspnet+color LFN, feat_aff on / sem_occ off, no memory bank
    # (bashscripts/densepose/train_spml_point.sh:14-44)
    def make_cfg(clusters):
        return load_config(overrides=_overrides(clusters))

    def _overrides(clusters):
        return {
        "dataset": {"num_classes": N_CLASSES, "data_dir": root,
                    "train_data_list": os.path.join(root, "train.txt")},
        "network": {"backbone_types": "panoptic_pspnet_101_densepose",
                    "embedding_dim": 32,
                    "kmeans_num_clusters": list(clusters),
                    "kmeans_iterations": 10,
                    "bn_momentum": 0.1,  # from-random init
                    "prediction_types": "segsort"},
        "train": {"batch_size": args.batch, "crop_size": [128, 128],
                  "memory_bank_size": 0, "max_iteration": args.iters,
                  "snapshot_step": args.iters, "tensorboard_step": 100,
                  "base_lr": 3e-3, "warmup_iteration": 0,
                  "random_mirror": True, "random_scale": True,
                  "random_crop": True, "shuffle": True,
                  "sem_ann_concentration": 6.0,
                  "sem_occ_loss_types": "none",
                  "img_sim_concentration": 16.0,
                  "sem_ann_loss_weight": 1.0,
                  "img_sim_loss_weight": 0.1,
                  "feat_aff_loss_types": "segsort",
                  "feat_aff_concentration": 12.0,
                  "feat_aff_loss_weight": 0.5},
        "test": {"image_size": SIZE, "crop_size": [SIZE, SIZE],
                 "stride": [SIZE, SIZE]},
        "tpu": {"segment_capacity": 128, "compute_dtype": "bfloat16",
                "use_fused_loss": not args.no_fused,
                "apply_feat_aff": args.apply_feat_aff},
        }

    # train coarse (reference trains 12x12 at 640 crop; our 128 crop
    # world scales to 4x4), infer fine (the reference doubles cluster
    # granularity at inference: train_spml_point.sh 24,24)
    cfg = make_cfg((4, 4))
    infer_cfg = make_cfg((8, 8))

    snap = os.path.join(root, "snapshot")
    ns = argparse.Namespace(
        data_dir=root, data_list=os.path.join(root, "train.txt"),
        snapshot_dir=snap, semantic_memory_dir=None, cam_dir=None,
        save_dir=None, crf_iter_max=10, crf_pos_w=3, crf_pos_xy_std=1,
        crf_bi_w=4, crf_bi_xy_std=67, crf_bi_rgb_std=3)
    t0 = time.time()
    driver.train_spml(ns, cfg, datasets.DenseposeTagDataset)
    train_s = time.time() - t0
    print(f"train: {train_s:.0f}s", flush=True)

    proto_dir = os.path.join(snap, "results", "train")
    runner.run_prototype(
        argparse.Namespace(**{
            **vars(ns), "save_dir": proto_dir,
            "data_list": os.path.join(root, "train_dense.txt")}),
        infer_cfg, save_clusters=False)

    val_dir = os.path.join(snap, "results", "val")
    runner.run_knn_inference(
        argparse.Namespace(**{
            **vars(ns), "save_dir": val_dir,
            "data_list": os.path.join(root, "val.txt"),
            "semantic_memory_dir": os.path.join(proto_dir,
                                                "semantic_prototype")}),
        infer_cfg)

    result = runner.run_benchmark(
        argparse.Namespace(**{
            **vars(ns), "save_dir": val_dir,
            "data_list": os.path.join(root, "val.txt")}),
        cfg)

    present = [0, 1, 2, 3, 14]
    ious = [float(result["class_iou"][c]) for c in present]
    out = {"iters": args.iters, "train_s": round(train_s, 1),
           "apply_feat_aff": args.apply_feat_aff,
           "present_classes": present,
           "class_iou": [round(x, 3) for x in ious],
           "val_miou_present": round(float(np.mean(ious)), 4)}
    print(json.dumps(out))
    with open(args.out or os.path.join(ROOT, "DENSEPOSE_E2E.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
