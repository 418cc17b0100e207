"""Cross-implementation A/B for the tag-drill classifier collapse
(round-4 verdict item 5).

Round-4's tag drill found every softmax classifier trained on the
cam_nn teacher labels collapses to constant background (val mIoU
0.0335 == pixel-acc/21; SYNTH_SELFTRAIN.json tag notes), and ASSERTED
the reference's classifier would collapse identically (plain CE, no
class balancing — softmax_classifier.py:31-33 in twke18/SPML). This
script turns the assertion into a measurement:

  1. export OUR tag stage-1 embedding (the drill's orbax snapshot) to
     a reference-named .pth (utils/torch_export.py) and load it into
     the REFERENCE's own ResnetDeeplab (so both implementations'
     classifiers consume the SAME frozen embedding weights);
  2. train the REFERENCE's SoftmaxClassifier (their module, their CE,
     their SGD semantics via lib/nn/optimizer.py) on the SAME cam_nn
     teacher labels the drill used;
  3. evaluate its val predictions and test the same collapse
     signature: constant class-0 output, mIoU == pixel-acc/21.

CPU-only (the reference runs on CPU in this image); reduced crop for
clock (the collapse mechanism — argmax-background is the CE-optimal
fit to a 74%-background teacher — is scale-independent; recorded in
the artifact). Writes TAG_COLLAPSE_AB.json.

Usage:
  python pyscripts/misc/tag_collapse_reference_ab.py \
      [--snap /tmp/drill/snap_tag] [--world /tmp/drill/VOCdevkit] \
      [--iters 200] [--batch 4] [--crop 128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IGNORE = 255
N_CLASSES = 21


def export_our_stage1(snap, dim=64):
    """Orbax stage-1 snapshot -> reference-named torch state dict."""
    import orbax.checkpoint as ocp

    from spml_tpu.utils import checkpoint as ckpt
    from spml_tpu.utils import torch_export
    ck_dir = os.path.join(snap, "stage1", "checkpoints")
    step = ckpt.latest_step(ck_dir)
    assert step is not None, f"no checkpoint under {ck_dir}"
    with ocp.CheckpointManager(os.path.abspath(ck_dir)) as mgr:
        restored = mgr.restore(step)
    evars = {"params": restored["params"]["embedding"],
             "batch_stats": restored["batch_stats"]["embedding"]}
    return torch_export.export_embedding_model(evars), step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snap", default="/tmp/drill/snap_tag")
    ap.add_argument("--world", default="/tmp/drill/VOCdevkit")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n_val", type=int, default=40)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "TAG_COLLAPSE_AB.json"))
    args = ap.parse_args()

    import lockstep_parity as lp  # reference import/shim glue
    lp._install_reference()
    import torch
    torch.manual_seed(0)

    import spml.utils.general.train as train_utils
    from lib.nn.optimizer import SGD
    from spml.models.embeddings.resnet_deeplab import (
        resnet_101_deeplab, resnet_50_deeplab)
    from spml.models.predictions.softmax_classifier import (
        softmax_classifier)

    e = lp._edict
    cfg = e(network=e(embedding_dim=args.dim, label_divisor=2048,
                      kmeans_num_clusters=[1, 1], kmeans_iterations=0),
            dataset=e(num_classes=N_CLASSES,
                      semantic_ignore_index=IGNORE))

    # --- our tag stage-1 embedding into THEIR model -------------------
    sd_np, step = export_our_stage1(args.snap, args.dim)
    factory = {101: resnet_101_deeplab, 50: resnet_50_deeplab}[args.depth]
    emb = factory(cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd_np.items()}
    # ResnetBase overrides load_state_dict (warn-and-skip,
    # base_model.py:26-52) with a different signature; use the plain
    # nn.Module loader so missing/unexpected are reported exactly
    missing, unexpected = torch.nn.Module.load_state_dict(
        emb, sd, strict=False)
    # lfn.* (fixed Gaussian) is expected-missing; anything else is a bug
    bad_missing = [m for m in missing if not m.startswith("lfn.")]
    print(f"loaded our stage-1 (step {step}) into reference model: "
          f"{len(sd)} tensors, missing={bad_missing}, "
          f"unexpected={list(unexpected)}", flush=True)
    assert not bad_missing and not unexpected
    emb.eval()
    for p in emb.parameters():
        p.requires_grad_(False)

    pred = softmax_classifier(cfg)

    # --- the SAME teacher labels the drill's classifier trained on ----
    teacher_dir = os.path.join(args.snap, "stage1", "pseudo_labels",
                               "train+_cam_nn", "semantic_gray")
    assert os.path.isdir(teacher_dir), teacher_dir
    lists = os.path.join(args.world, "lists")
    with open(os.path.join(lists, "seam.txt")) as f:
        rows = [ln.split() for ln in f.read().splitlines() if ln]
    tlist = "/tmp/tag_ab_list.txt"
    with open(tlist, "w") as f:
        f.write("\n".join(" ".join([
            os.path.join(args.world, img),
            os.path.join(teacher_dir,
                         os.path.splitext(os.path.basename(img))[0]
                         + ".png"),
            os.path.join(args.world, hed)])
            for img, _, hed in rows) + "\n")

    from spml_tpu.data import datasets
    ds = datasets.ListDataset(
        "/", tlist, img_mean=(0.485, 0.456, 0.406),
        img_std=(0.229, 0.224, 0.225), size=(args.crop, args.crop),
        random_crop=True, random_scale=True, random_mirror=True,
        training=True, seed=0)

    # teacher label composition (the collapse driver)
    hist = np.zeros(256, np.int64)
    for name in sorted(os.listdir(teacher_dir))[:50]:
        import PIL.Image
        lab = np.array(PIL.Image.open(os.path.join(teacher_dir, name)))
        hist += np.bincount(lab.reshape(-1), minlength=256)
    frac_bg = hist[0] / max(hist[:N_CLASSES].sum(), 1)

    # --- train THEIR classifier on the teacher ------------------------
    rng = np.random.RandomState(0)
    groups = pred.get_params_lr()
    opt = SGD(groups, lr=1, momentum=0.9, weight_decay=5e-4)
    pred.train()
    t0 = time.time()
    for it in range(args.iters):
        idx = rng.randint(0, len(ds), size=args.batch)
        items = [ds[int(i)] for i in idx]
        img = torch.from_numpy(np.stack(
            [x["image"] for x in items]).transpose(0, 3, 1, 2)
            .copy()).float()
        lab = torch.from_numpy(np.stack(
            [x["semantic_label"] for x in items]).copy()).long()
        with torch.no_grad():
            out = emb.generate_embeddings({"image": img})
        outputs = pred({"embedding": out["embedding"]},
                       {"semantic_label": lab})
        loss = outputs["sem_ann_loss"]
        lr = train_utils.lr_poly(args.lr, it, args.iters, 0)
        opt.zero_grad()
        loss.backward()
        opt.step(lr)
        if it % 25 == 0 or it == args.iters - 1:
            print(f"iter {it}: ce={float(loss):.4f} "
                  f"acc={float(outputs['accuracy']):.4f}", flush=True)
    train_s = time.time() - t0

    # --- val predictions: the collapse signature ----------------------
    pred.eval()
    with open(os.path.join(lists, "val.txt")) as f:
        val_rows = [ln.split() for ln in f.read().splitlines()
                    if ln][:args.n_val]
    import PIL.Image
    conf = np.zeros((N_CLASSES, N_CLASSES), np.int64)
    pred_hist = np.zeros(N_CLASSES, np.int64)
    constant_bg_images = 0
    t0 = time.time()
    for img_rel, gt_rel, _ in val_rows:
        img = np.array(PIL.Image.open(
            os.path.join(args.world, img_rel)).convert("RGB"))
        gt = np.array(PIL.Image.open(
            os.path.join(args.world, gt_rel)))
        x = (img.astype(np.float32) / 255.0
             - (0.485, 0.456, 0.406)) / (0.229, 0.224, 0.225)
        t = torch.from_numpy(
            x.transpose(2, 0, 1)[None].copy()).float()
        with torch.no_grad():
            o = emb.generate_embeddings({"image": t})
            outputs = pred(
                {"embedding": o["embedding"]},
                {"semantic_label": torch.from_numpy(
                    gt.astype(np.int64))[None]})
            p = outputs["semantic_prediction"][0].numpy()
        pred_hist += np.bincount(p.reshape(-1), minlength=N_CLASSES)
        if np.all(p == 0):
            constant_bg_images += 1
        m = gt != IGNORE
        conf += np.bincount(
            gt[m].astype(np.int64) * N_CLASSES + p[m],
            minlength=N_CLASSES * N_CLASSES).reshape(N_CLASSES, -1)
    infer_s = time.time() - t0

    tp = np.diag(conf).astype(np.float64)
    denom = conf.sum(0) + conf.sum(1) - np.diag(conf)
    iou = tp / np.maximum(denom, 1)
    miou = float(iou[denom > 0].mean())
    pixel_acc = float(tp.sum() / conf.sum())
    collapse = (constant_bg_images == len(val_rows))

    out = {
        "question": "does the REFERENCE's SoftmaxClassifier collapse "
                    "to constant background on the same cam_nn "
                    "teacher, like ours did in the tag drill? "
                    "(round-4 verdict item 5)",
        "setup": {
            "frozen_embedding": f"OUR tag stage-1 (orbax step {step}) "
                                f"exported via torch_export and loaded "
                                f"into the reference ResnetDeeplab — "
                                f"both classifiers see the same "
                                f"embedding weights",
            "classifier": "reference softmax_classifier.py module, "
                          "reference lib/nn SGD (head lr x10/x20), "
                          "plain CE",
            "teacher": "tag drill cam_nn pseudo labels "
                       "(SYNTH_SELFTRAIN.json: 0.061 train mIoU)",
            "teacher_background_fraction": round(float(frac_bg), 4),
            "iters": args.iters, "batch": args.batch,
            "crop": args.crop,
            "scale_note": "crop reduced vs the drill's 512 for CPU "
                          "clock; CE-collapse is a label-composition "
                          "effect, not a resolution effect",
        },
        "reference_result": {
            "val_miou": round(miou, 4),
            "val_pixel_accuracy": round(pixel_acc, 4),
            "pixel_acc_over_21": round(pixel_acc / N_CLASSES, 4),
            "constant_background_images":
                f"{constant_bg_images}/{len(val_rows)}",
            "pred_class_histogram_nonzero": {
                int(i): int(c) for i, c in enumerate(pred_hist) if c},
            "collapsed": bool(collapse),
        },
        "ours_recorded": {
            "val_miou": 0.033501,
            "note": "SYNTH_SELFTRAIN.json tag notes: every val PNG "
                    "constant class 0; mIoU == pixel-acc/21 "
                    "(0.70353/21)",
        },
        "conclusion": (
            "CONFIRMED: the reference's own classifier collapses to "
            "constant background on this teacher too — the tag-drill "
            "collapse is a property of plain-CE distillation from a "
            "~74%-background teacher, not of our implementation"
            if collapse else
            "NOT REPRODUCED: the reference classifier did not fully "
            "collapse — revise the round-4 assertion (see "
            "reference_result for what it predicted)"),
        "train_s": round(train_s, 1), "infer_s": round(infer_s, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
