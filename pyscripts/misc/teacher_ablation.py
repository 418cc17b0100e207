"""Teacher-quality ablation for the stage-2 classifier (round-4 verdict
item 2).

Question: the 1500-iter from-scratch scribble drill's stage-2
classifier (trained on 0.533-mIoU cam_rw pseudo labels) loses to the
stage-1 KNN readout (0.137 vs 0.161, PIPELINE_DRILL_LONG.json). The
claimed root cause was teacher quality — asserted, never isolated.
This script varies ONLY the classifier's teacher labels while holding
the stage-1 embedding, shapes and iteration counts fixed:

  (a) gt       — dense ground-truth segcls (a PERFECT teacher);
  (b) pseudo   — the pipeline's own cam_rw pseudo labels
                 (pseudo_softmaxrw_crf, the production teacher);
  (c) softmax  — the stage-1 softmax head's argmax train predictions.

If (a) beats the KNN readout, the classifier head + recipe are fine
and the cap is the teacher; if even (a) loses, the cap is the frozen
from-scratch embedding the head consumes (train_classifier.py freezes
the embedding model — reference train_classifier.py:99-116).

OPERATIONAL NOTE (measured round 5): running all ~17 stages in ONE
process accumulates host memory (jit caches + loader threads + frozen
replicas per arm) — the third classifier arm OOMed at 130 GB RSS.
Per-stage resume makes the fix trivial: re-invoke the script and it
completes only the missing stages in a fresh process. For a fresh
full run, prefer one invocation per teacher (--teachers gt, then
pseudo, then softmax).

All stages run the same package code paths as the bash pipeline's CLIs
(driver.train_spml / runner.run_prototype / run_knn_inference /
run_pseudo_softmax / run_softmax_inference / run_benchmark) at the
drill's flagship shapes (crop 512, R101 dim 64, batch 4; classifier
batch 16 x 800 iters — train_spml_scribble.sh defaults). Per-stage
resume via done-markers; ~3 h total on one v5e chip.

Usage:
  python pyscripts/misc/teacher_ablation.py \
      --world /tmp/drill/VOCdevkit --root /tmp/ablation \
      [--iters 1500] [--cls_iters 800] [--teachers gt,pseudo,softmax]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)

CRF = dict(crf_iter_max=10, crf_pos_w=3, crf_pos_xy_std=1, crf_bi_w=4,
           crf_bi_xy_std=67, crf_bi_rgb_std=3)


def _ns(**kw):
    base = dict(data_dir=None, data_list=None, snapshot_dir=None,
                save_dir=None, semantic_memory_dir=None, cam_dir=None,
                **CRF)
    base.update(kw)
    return argparse.Namespace(**base)


SMOKE = False


def build_cfg_emb(world, iters, seed=0):
    from spml_tpu.config import load_config
    if SMOKE:
        return load_config(overrides={
            "dataset": {"num_classes": 21, "data_dir": world,
                        "train_data_list": os.path.join(
                            world, "lists", "scribble.txt")},
            "network": {"backbone_types": "panoptic_deeplab_10",
                        "embedding_dim": 8,
                        "kmeans_num_clusters": [2, 2],
                        "kmeans_iterations": 2, "bn_momentum": 0.1,
                        "prediction_types": "segsort"},
            "train": {"seed": seed, "batch_size": 2,
                      "crop_size": [64, 64], "memory_bank_size": 2,
                      "max_iteration": iters, "snapshot_step": iters,
                      "warmup_iteration": 0, "base_lr": 3e-3,
                      "random_mirror": True, "random_scale": True,
                      "random_crop": True, "shuffle": True},
            "test": {"image_size": 128, "crop_size": [128, 128],
                     "stride": [128, 128]},
            "tpu": {"segment_capacity": 64,
                    "compute_dtype": "float32",
                    "use_fused_loss": False},
        })
    return load_config(overrides={
        "dataset": {"num_classes": 21, "data_dir": world,
                    "train_data_list": os.path.join(world, "lists",
                                                    "scribble.txt")},
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": 64,
                    "kmeans_num_clusters": [6, 6],
                    "kmeans_iterations": 10,
                    "bn_momentum": 0.1,  # from scratch, like the drill
                    "prediction_types": "segsort"},
        "train": {"seed": seed, "batch_size": 4,
                  "crop_size": [512, 512],
                  "memory_bank_size": 2, "max_iteration": iters,
                  "snapshot_step": iters, "warmup_iteration": 100,
                  "base_lr": 3e-3, "weight_decay": 5e-4,
                  "random_mirror": True, "random_scale": True,
                  "random_crop": True, "shuffle": True,
                  "sem_ann_concentration": 6.0,
                  "sem_occ_concentration": 12.0,
                  "img_sim_concentration": 16.0,
                  "sem_ann_loss_weight": 1.0,
                  "sem_occ_loss_weight": 0.5,
                  "img_sim_loss_weight": 0.1},
        "test": {"image_size": 512, "crop_size": [512, 512],
                 "stride": [512, 512]},
        "tpu": {"segment_capacity": 256, "compute_dtype": "bfloat16",
                "use_fused_loss": True},
    })


def infer_cfg(cfg, clusters=(12, 12)):
    """Bash inference flags: --kmeans_num_clusters 12,12
    --label_divisor 2048 (train_spml_scribble.sh:97-111)."""
    import copy
    c = copy.deepcopy(cfg)
    c.network.kmeans_num_clusters = list(clusters)
    c.network.label_divisor = 2048
    return c


def build_cfg_cls(world, stage1_snap, cls_iters, seed=0):
    cfg = build_cfg_emb(world, cls_iters, seed)
    cfg.network.prediction_types = "softmax_classifier"
    cfg.network.pretrained = stage1_snap
    cfg.train.batch_size = 2 if SMOKE else 16
    cfg.train.max_iteration = cls_iters
    cfg.train.snapshot_step = cls_iters
    cfg.network.kmeans_iterations = 0
    cfg.network.kmeans_num_clusters = [1, 1]
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="/tmp/drill/VOCdevkit")
    ap.add_argument("--root", default="/tmp/ablation")
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--cls_iters", type=int, default=800)
    ap.add_argument("--teachers", default="gt,pseudo,softmax")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "TEACHER_ABLATION.json"))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (validates the ablation "
                         "machinery, not a measurement)")
    args = ap.parse_args()
    if args.smoke:
        global SMOKE
        SMOKE = True
    world, root = args.world, args.root
    os.makedirs(root, exist_ok=True)
    marks = os.path.join(root, "done")
    os.makedirs(marks, exist_ok=True)

    from spml_tpu.cli import enable_compilation_cache, select_platform
    select_platform()

    from spml_tpu.inference import runner
    from spml_tpu.train import driver

    cfg = build_cfg_emb(world, args.iters)
    enable_compilation_cache(cfg)
    lists = os.path.join(world, "lists")
    train_list = os.path.join(lists, "scribble.txt")
    memory_list = os.path.join(lists, "memory.txt")
    val_list = os.path.join(lists, "val.txt")
    stage1 = os.path.join(root, "stage1")
    timings, results = {}, {}

    def stage(name, fn):
        mark = os.path.join(marks, name + ".json")
        if os.path.exists(mark):
            with open(mark) as f:
                rec = json.load(f)
            print(f"[resume] {name}: {rec}", flush=True)
            timings[name] = rec["seconds"]
            return rec.get("result")
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 1)
        timings[name] = dt
        with open(mark, "w") as f:
            json.dump({"seconds": dt, "result": out}, f)
        print(f"[stage] {name}: {dt}s {out if out else ''}", flush=True)
        return out

    # --- stage 1: from-scratch SPML embedding training -----------------
    stage("train_stage1", lambda: (driver.train_spml(
        _ns(data_dir=world, data_list=train_list, snapshot_dir=stage1),
        cfg), None)[1])

    # --- prototypes over dense memory list -----------------------------
    proto_dir = os.path.join(stage1, "results", "train+")
    stage("prototype", lambda: (runner.run_prototype(
        _ns(data_dir=world, data_list=memory_list, snapshot_dir=stage1,
            save_dir=proto_dir), infer_cfg(cfg)), None)[1])

    # --- stage-1 KNN readout on val (the 0.161-analog) -----------------
    knn_dir = os.path.join(stage1, "results", "val")
    stage("knn_inference", lambda: (runner.run_knn_inference(
        _ns(data_dir=world, data_list=val_list, snapshot_dir=stage1,
            save_dir=knn_dir,
            semantic_memory_dir=os.path.join(proto_dir,
                                             "semantic_prototype")),
        infer_cfg(cfg)), None)[1])
    knn_miou = stage("knn_benchmark", lambda: round(float(
        runner.run_benchmark(
            _ns(data_dir=world, data_list=val_list, save_dir=knn_dir),
            cfg)["mean_iou"]), 4))
    results["stage1_knn_val"] = knn_miou

    # --- teacher label sources -----------------------------------------
    pseudo_dir = os.path.join(stage1, "pseudo_labels", "train+_cam_rw")
    softmax_tr_dir = os.path.join(stage1, "results", "train+_softmax")
    teachers = args.teachers.split(",")

    if "pseudo" in teachers:
        stage("pseudo_labels", lambda: (runner.run_pseudo_softmax(
            _ns(data_dir=world, data_list=train_list,
                snapshot_dir=stage1, save_dir=pseudo_dir),
            infer_cfg(cfg, clusters=(1, 1)), with_crf=True,
            with_walk=True, scales=(1.0,)), None)[1])
        # benchmark vs DENSE GT: memory.txt's label column is segcls
        # (scribble.txt's is the weak scribbles)
        results["pseudo_train_miou"] = stage(
            "pseudo_benchmark", lambda: round(float(
                runner.run_benchmark(
                    _ns(data_dir=world, data_list=memory_list,
                        save_dir=pseudo_dir), cfg)["mean_iou"]), 4))

    if "softmax" in teachers:
        stage("softmax_train_inference", lambda: (
            runner.run_softmax_inference(
                _ns(data_dir=world, data_list=train_list,
                    snapshot_dir=stage1, save_dir=softmax_tr_dir),
                cfg), None)[1])
        results["softmax_teacher_train_miou"] = stage(
            "softmax_train_benchmark", lambda: round(float(
                runner.run_benchmark(
                    _ns(data_dir=world, data_list=memory_list,
                        save_dir=softmax_tr_dir), cfg)["mean_iou"]), 4))

    # --- classifier train lists (img label hed), bash sed-analog -------
    def write_list(name, label_dir_abs):
        """Rewrite scribble.txt's label column to `label_dir_abs`
        (absolute), like train_spml_scribble.sh's sed; images/hed stay
        under the world root (absolute too, data_dir='/')."""
        path = os.path.join(root, f"list_{name}.txt")
        with open(train_list) as f:
            lines = [ln.split() for ln in f.read().splitlines() if ln]
        out = []
        for img, _, hed in lines:
            base = os.path.splitext(os.path.basename(img))[0]
            out.append(" ".join([
                os.path.join(world, img),
                os.path.join(label_dir_abs, base + ".png"),
                os.path.join(world, hed)]))
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
        return path

    label_dirs = {
        "gt": os.path.join(world, "VOC2012", "segcls"),
        "pseudo": os.path.join(pseudo_dir, "semantic_gray"),
        "softmax": os.path.join(softmax_tr_dir, "semantic_gray"),
    }

    from spml_tpu.data import datasets
    for teacher in teachers:
        cls_snap = os.path.join(root, f"cls_{teacher}")
        cls_cfg = build_cfg_cls(world, stage1, args.cls_iters)
        tlist = write_list(teacher, label_dirs[teacher])
        stage(f"train_cls_{teacher}", lambda t=tlist, s=cls_snap,
              c=cls_cfg: (driver.train_classifier(
                  _ns(data_dir="/", data_list=t, snapshot_dir=s), c,
                  datasets.ListTagClassifierDataset), None)[1])
        vdir = os.path.join(cls_snap, "results", "val")
        stage(f"val_inference_{teacher}", lambda s=cls_snap, v=vdir,
              c=cls_cfg: (runner.run_softmax_inference(
                  _ns(data_dir=world, data_list=val_list,
                      snapshot_dir=s, save_dir=v), c), None)[1])
        results[f"classifier_{teacher}_val"] = stage(
            f"benchmark_{teacher}", lambda v=vdir: round(float(
                runner.run_benchmark(
                    _ns(data_dir=world, data_list=val_list,
                        save_dir=v), cfg)["mean_iou"]), 4))

    # --- verdict --------------------------------------------------------
    gt = results.get("classifier_gt_val")
    interpretation = None
    if gt is not None and knn_miou is not None:
        if gt > knn_miou:
            interpretation = (
                "classifier-on-GT beats the stage-1 KNN readout: the "
                "head + recipe have the capacity; the production "
                "classifier's deficit is its TEACHER (pseudo-label "
                "quality), as hypothesized in SYNTH_SELFTRAIN.json")
        else:
            interpretation = (
                "classifier-on-GT does NOT beat the stage-1 KNN "
                "readout: even a perfect teacher cannot close the gap, "
                "so the cap is the frozen from-scratch embedding the "
                "classifier head consumes (train_classifier freezes "
                "the embedding model), not the teacher")
    out = {
        "question": "why does the stage-2 classifier lose to stage-1 "
                    "KNN in the from-scratch drills? (round-4 verdict "
                    "item 2: vary teacher quality, hold all else fixed)",
        "world": world, "stage1_iters": args.iters,
        "cls_iters": args.cls_iters,
        "protocol": "same stage-1 embedding (from scratch, drill "
                    "flagship shapes), classifier batch 16 x "
                    f"{args.cls_iters}, only the teacher labels vary",
        "results": results, "interpretation": interpretation,
        "timings_s": timings,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
