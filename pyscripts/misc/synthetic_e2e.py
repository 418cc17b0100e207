"""End-to-end learning validation on a synthetic scribble dataset.

No VOC/COCO data exists in this image, so this validates the whole
pipeline the way the reference's bash scripts would on real data:
generate a color-shape world with SCRIBBLE supervision -> stage-1 SPML
contrastive training from random init (driver.train_spml) -> memory-bank
prototypes over train (runner.run_prototype) -> KNN inference on a held
-out val split (runner.run_knn_inference) -> mIoU (runner.run_benchmark).

All stages run through the same code paths as the pyscripts CLIs,
end-to-end on the default device (TPU). Writes SYNTH_E2E.json.

Usage: python pyscripts/misc/synthetic_e2e.py [--iters 400] [--root DIR]
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

N_CLASSES = 5  # background + 4 shape classes
SIZE = 160

# distinctive (but noisy) class colors
COLORS = np.array([[40, 90, 50], [200, 60, 60], [60, 80, 200],
                   [220, 200, 70], [150, 70, 180]], np.float32)


def _scribble(rng, mask, n_strokes=2, width=2):
    """Thin random strokes inside `mask` (the scribble annotation)."""
    out = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    if len(ys) < 10:
        return out
    h, w = mask.shape
    for _ in range(n_strokes):
        i = rng.randint(len(ys))
        y, x = float(ys[i]), float(xs[i])
        ang = rng.rand() * 2 * np.pi
        for _ in range(40):
            yi, xi = int(round(y)), int(round(x))
            if not (0 <= yi < h and 0 <= xi < w) or not mask[yi, xi]:
                break
            out[max(0, yi - width // 2):yi + width // 2 + 1,
                max(0, xi - width // 2):xi + width // 2 + 1] |= \
                mask[max(0, yi - width // 2):yi + width // 2 + 1,
                     max(0, xi - width // 2):xi + width // 2 + 1]
            ang += (rng.rand() - 0.5) * 0.6
            y += np.sin(ang)
            x += np.cos(ang)
    return out


def make_world(root, rng, n_train=48, n_val=12):
    for sub in ("JPEGImages", "segcls", "seginst", "scribble"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    train_lines, val_lines = [], []
    for i in range(n_train + n_val):
        is_train = i < n_train
        sem = np.zeros((SIZE, SIZE), np.uint8)
        inst = np.zeros((SIZE, SIZE), np.uint8)
        yy, xx = np.mgrid[:SIZE, :SIZE]
        for k in range(rng.randint(2, 4)):
            # cycle the first shape's class so every class is present
            # in both splits; remaining shapes are random
            cls = (1 + i % (N_CLASSES - 1)) if k == 0 \
                else rng.randint(1, N_CLASSES)
            cy, cx = rng.randint(24, SIZE - 24, 2)
            if rng.rand() < 0.5:
                r = rng.randint(14, 30)
                m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            else:
                hh, ww2 = rng.randint(12, 26, 2)
                m = (abs(yy - cy) < hh) & (abs(xx - cx) < ww2)
            sem[m] = cls
            inst[m] = k + 1
        img = COLORS[sem] + rng.randn(SIZE, SIZE, 3) * 18
        # light texture so background isn't constant
        img += (np.sin(yy / 7.0) * 6 + np.cos(xx / 9.0) * 6)[..., None]
        img = np.clip(img, 0, 255).astype(np.uint8)

        scr = np.full((SIZE, SIZE), 255, np.uint8)
        for cls in np.unique(sem):
            m = _scribble(rng, sem == cls)
            scr[m.astype(bool)] = cls

        base = f"im{i:03d}"
        PIL.Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", base + ".jpg"), quality=95)
        PIL.Image.fromarray(sem).save(
            os.path.join(root, "segcls", base + ".png"))
        PIL.Image.fromarray(inst).save(
            os.path.join(root, "seginst", base + ".png"))
        PIL.Image.fromarray(scr).save(
            os.path.join(root, "scribble", base + ".png"))
        line = (f"JPEGImages/{base}.jpg "
                f"{'scribble' if is_train else 'segcls'}/{base}.png "
                f"seginst/{base}.png")
        (train_lines if is_train else val_lines).append(line)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(val_lines) + "\n")
    # The memory-bank/prototype stage uses DENSE labels, mirroring the
    # reference pipeline: MEMORY_DATA_LIST=panoptic_train+_hed.txt points
    # at segcls, not the weak scribbles (train_spml_scribble.sh:74,137 —
    # weak labels only supervise the embedding training).
    with open(os.path.join(root, "memory.txt"), "w") as f:
        f.write("\n".join(
            ln.replace("scribble/", "segcls/") for ln in train_lines)
            + "\n")


def build_cfg(root, iters, batch=8, seed=0):
    """The flagship-recipe-at-tiny-scale config shared by the synthetic
    e2e scripts (synthetic_e2e.py, synthetic_selftrain_e2e.py)."""
    from spml_tpu.config import load_config
    return load_config(overrides={
        "dataset": {"num_classes": N_CLASSES, "data_dir": root,
                    "train_data_list": os.path.join(root, "train.txt")},
        "network": {"backbone_types": "panoptic_deeplab_50",
                    "embedding_dim": 32,
                    "kmeans_num_clusters": [4, 4],
                    "kmeans_iterations": 10,
                    "bn_momentum": 0.1,  # from-random init
                    "prediction_types": "segsort"},
        "train": {"seed": seed,
                  "batch_size": batch, "crop_size": [128, 128],
                  "memory_bank_size": 2, "max_iteration": iters,
                  "snapshot_step": iters, "tensorboard_step": 100,
                  "base_lr": 3e-3, "warmup_iteration": 0,
                  "random_mirror": True, "random_scale": True,
                  "random_crop": True, "shuffle": True,
                  "sem_ann_concentration": 6.0,
                  "sem_occ_concentration": 12.0,
                  "img_sim_concentration": 16.0,
                  "sem_ann_loss_weight": 1.0,
                  "sem_occ_loss_weight": 0.5,
                  "img_sim_loss_weight": 0.1},
        "test": {"image_size": SIZE, "crop_size": [SIZE, SIZE],
                 "stride": [SIZE, SIZE]},
        "tpu": {"segment_capacity": 128, "compute_dtype": "bfloat16",
                "use_fused_loss": True},
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--root", default="/tmp/synth_e2e")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0,
                    help="train.seed offset (init/shuffle/aug); the "
                         "world itself stays fixed at seed 7")
    ap.add_argument("--n_val", type=int, default=12,
                    help="val-split size. The 48 train images are drawn "
                         "FIRST from the fixed world rng, so widening "
                         "val leaves every per-seed trained model "
                         "bitwise identical and only shrinks the val-"
                         "estimator noise (per-seed sd ~ 1/sqrt(n_val);"
                         " round-4 verdict item 8). 36 = the 'wide' "
                         "protocol")
    ap.add_argument("--out", default=None,
                    help="output json path (default SYNTH_E2E.json)")
    args = ap.parse_args()

    from spml_tpu.inference import runner
    from spml_tpu.train import driver

    rng = np.random.RandomState(7)
    root = args.root
    make_world(root, rng, n_val=args.n_val)

    cfg = build_cfg(root, args.iters, args.batch, args.seed)

    snap = os.path.join(root, "snapshot")
    t0 = time.time()
    ns = argparse.Namespace(
        data_dir=root, data_list=os.path.join(root, "train.txt"),
        snapshot_dir=snap, semantic_memory_dir=None, cam_dir=None,
        save_dir=None, crf_iter_max=10, crf_pos_w=3, crf_pos_xy_std=1,
        crf_bi_w=4, crf_bi_xy_std=67, crf_bi_rgb_std=3)
    driver.train_spml(ns, cfg)
    train_s = time.time() - t0
    print(f"train: {train_s:.0f}s", flush=True)

    proto_dir = os.path.join(snap, "results", "train")
    runner.run_prototype(
        argparse.Namespace(**{**vars(ns), "snapshot_dir": snap,
                              "save_dir": proto_dir,
                              "data_list": os.path.join(root,
                                                        "memory.txt")}),
        cfg, save_clusters=False)

    val_dir = os.path.join(snap, "results", "val")
    runner.run_knn_inference(
        argparse.Namespace(**{
            **vars(ns), "snapshot_dir": snap, "save_dir": val_dir,
            "data_list": os.path.join(root, "val.txt"),
            "semantic_memory_dir": os.path.join(proto_dir,
                                                "semantic_prototype")}),
        cfg)

    result = runner.run_benchmark(
        argparse.Namespace(**{
            **vars(ns), "save_dir": val_dir,
            "data_list": os.path.join(root, "val.txt")}),
        cfg)

    out = {"iters": args.iters, "seed": args.seed,
           "n_val": args.n_val,
           "train_s": round(train_s, 1),
           "val_miou": round(float(result["mean_iou"]), 4),
           "class_iou": [round(float(x), 3)
                         for x in result["class_iou"]]}
    print(json.dumps(out))
    with open(args.out or os.path.join(ROOT, "SYNTH_E2E.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
