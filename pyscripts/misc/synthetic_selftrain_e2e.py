"""Full multi-stage self-training chain on the synthetic scribble world.

Mirrors the reference's self-training structure (train_spml_tag.sh
round 2 applied on the scribble world; bashscripts/voc12/*.sh):

1. stage-1 SPML contrastive training from scribbles (driver.train_spml)
2. prototype memory bank over the train split (runner.run_prototype)
3. KNN retrieval on held-out val -> stage-1 mIoU
4. pseudo-labels on TRAIN via pseudo_inference_crf_msc semantics
   (KNN retrieval + tag mask + prob floor 0.15 + DenseCRF,
   runner.run_pseudo_knn) -> pseudo-label mIoU vs train GT
5. stage-2 softmax classifier distilled on the pseudo labels
   (driver.train_classifier with the frozen stage-1 embedding)
6. softmax inference on val -> stage-2 mIoU

Every stage runs through the same code paths as the pyscripts CLIs,
end-to-end on the default device (TPU). Writes SYNTH_SELFTRAIN.json.

Usage: python pyscripts/misc/synthetic_selftrain_e2e.py [--iters 400]
       [--cls_iters 300] [--root DIR] [--stage1 SNAPSHOT_DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)

import synthetic_e2e as s1  # noqa: E402  (same directory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--cls_iters", type=int, default=300)
    ap.add_argument("--root", default="/tmp/synth_selftrain")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stage1", default=None,
                    help="reuse an existing stage-1 snapshot dir "
                         "(e.g. /tmp/synth_e2e/snapshot) instead of "
                         "retraining; the world must match (seed 7)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from spml_tpu.inference import runner
    from spml_tpu.train import driver

    root = args.root
    s1.make_world(root, np.random.RandomState(7))
    cfg = s1.build_cfg(root, args.iters, args.batch, args.seed)

    def mkargs(**kw):
        base = dict(
            data_dir=root, data_list=os.path.join(root, "train.txt"),
            snapshot_dir=None, semantic_memory_dir=None, cam_dir=None,
            save_dir=None, crf_iter_max=10, crf_pos_w=3, crf_pos_xy_std=1,
            crf_bi_w=4, crf_bi_xy_std=67, crf_bi_rgb_std=3)
        base.update(kw)
        return argparse.Namespace(**base)

    out = {"iters": args.iters, "cls_iters": args.cls_iters,
           "seed": args.seed}

    # ---- 1) stage-1 contrastive training from scribbles ----
    snap = args.stage1 or os.path.join(root, "snapshot")
    if args.stage1:
        print(f"reusing stage-1 snapshot {snap}", flush=True)
    else:
        t0 = time.time()
        driver.train_spml(mkargs(snapshot_dir=snap), cfg)
        out["stage1_train_s"] = round(time.time() - t0, 1)
        print(f"stage-1 train: {out['stage1_train_s']}s", flush=True)

    # ---- 2) prototypes over the train split (dense labels) ----
    proto_dir = os.path.join(root, "results", "train")
    runner.run_prototype(
        mkargs(snapshot_dir=snap, save_dir=proto_dir,
               data_list=os.path.join(root, "memory.txt")),
        cfg, save_clusters=False)
    memory_dir = os.path.join(proto_dir, "semantic_prototype")

    # ---- 3) stage-1 KNN retrieval on val ----
    val_dir = os.path.join(root, "results", "val")
    runner.run_knn_inference(
        mkargs(snapshot_dir=snap, save_dir=val_dir,
               data_list=os.path.join(root, "val.txt"),
               semantic_memory_dir=memory_dir),
        cfg)
    r = runner.run_benchmark(
        mkargs(save_dir=val_dir, data_list=os.path.join(root, "val.txt")),
        cfg)
    out["stage1_val_miou"] = round(float(r["mean_iou"]), 4)
    print(f"stage-1 val mIoU: {out['stage1_val_miou']}", flush=True)

    # ---- 4) pseudo-labels on train (KNN + tag mask + floor + CRF) ----
    pseudo_dir = os.path.join(root, "results", "pseudo")
    runner.run_pseudo_knn(
        mkargs(snapshot_dir=snap, save_dir=pseudo_dir,
               semantic_memory_dir=memory_dir),
        cfg, scales=(0.5, 1.0, 1.5, 2.0), with_crf=True)
    r = runner.run_benchmark(
        mkargs(save_dir=pseudo_dir,
               data_list=os.path.join(root, "memory.txt")),  # dense GT
        cfg)
    out["pseudo_train_miou"] = round(float(r["mean_iou"]), 4)
    print(f"pseudo-label train mIoU: {out['pseudo_train_miou']}",
          flush=True)

    # ---- 5) stage-2 classifier distilled on the pseudo labels ----
    gray = os.path.join(pseudo_dir, "semantic_gray")
    rel = os.path.relpath(gray, root)
    with open(os.path.join(root, "train.txt")) as f:
        bases = [ln.split()[0] for ln in f if ln.strip()]
    lines = [f"{img} {rel}/{os.path.basename(img).replace('.jpg', '.png')}"
             f" seginst/{os.path.basename(img).replace('.jpg', '.png')}"
             for img in bases]
    pseudo_list = os.path.join(root, "pseudo_train.txt")
    with open(pseudo_list, "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg.network.pretrained = snap  # frozen stage-1 embedding
    cfg.train.max_iteration = args.cls_iters
    cfg.train.snapshot_step = args.cls_iters
    cls_snap = os.path.join(root, "classifier")
    t0 = time.time()
    driver.train_classifier(
        mkargs(snapshot_dir=cls_snap, data_list=pseudo_list), cfg)
    out["stage2_train_s"] = round(time.time() - t0, 1)
    print(f"stage-2 train: {out['stage2_train_s']}s", flush=True)

    # ---- 6) stage-2 softmax inference on val ----
    val2_dir = os.path.join(root, "results", "val_stage2")
    runner.run_softmax_inference(
        mkargs(snapshot_dir=cls_snap, save_dir=val2_dir,
               data_list=os.path.join(root, "val.txt")),
        cfg)
    r = runner.run_benchmark(
        mkargs(save_dir=val2_dir,
               data_list=os.path.join(root, "val.txt")),
        cfg)
    out["stage2_val_miou"] = round(float(r["mean_iou"]), 4)
    out["stage2_class_iou"] = [round(float(x), 3)
                               for x in r["class_iou"]]
    print(f"stage-2 val mIoU: {out['stage2_val_miou']}", flush=True)

    print(json.dumps(out))
    with open(args.out or os.path.join(ROOT, "SYNTH_SELFTRAIN.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
