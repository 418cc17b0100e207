"""End-to-end mIoU of the REFERENCE (torch, CPU) on our synthetic world.

The real-data north star (VOC12 mIoU parity) is unmeasurable in this
image — no datasets, zero egress. This is the closest attainable proxy:
run the reference implementation's OWN code (imported from
/root/reference: ResnetDeeplab, Segsort losses/predictions,
segment_by_kmeans, lib.nn SGD, the train.py:154-293 loop, the
prototype.py / inference.py inference recipe) over the IDENTICAL
synthetic scribble dataset + hyperparameters that produced our
SYNTH_E2E.json, and compare final val mIoU.

Matched to pyscripts/misc/synthetic_e2e.py: same world (seed 7), same
R50-deeplab/dim-32/kmeans(4,4)x10 model, 400 iters batch 8 crop 128,
lr 3e-3 poly, wd 5e-4, memory bank 2, losses sem_ann/sem_occ/img_sim =
1.0/0.5/0.1 at kappa 6/12/16, KNN top-20 inference at 160.

Deliberate deviations (documented, both applied to the torch side only
where the from-random-init regime requires them):
- BatchNorm momentum set to 0.1 (reference hardcodes 3e-4, which is
  tuned for ImageNet-pretrained running stats; from random init the
  eval-mode stats would still be near their init after 400 iters —
  our side trains with bn_momentum 0.1 for the same reason).
- The data pipeline is ours (PIL/numpy transforms, proven equivalent
  to the reference's cv2 ones in tests/test_data.py) because cv2 is
  not installed; augmentation draws use a different RNG stream, so
  this is an OUTCOME comparison (final mIoU), not a lockstep one —
  see LOCKSTEP.json for the step-level parity evidence.

Usage: python pyscripts/misc/synthetic_e2e_reference.py [--iters 400]
Writes SYNTH_E2E_REF.json at the repo root.
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

import lockstep_parity as lp  # noqa: E402  (reference import/shim glue)
import synthetic_e2e as se  # noqa: E402  (shared synthetic world)

N_CLASSES = se.N_CLASSES
SIZE = se.SIZE
IGNORE = 255


def reference_config():
    e = lp._edict
    return e(
        network=e(embedding_dim=32, label_divisor=255,
                  kmeans_num_clusters=[4, 4], kmeans_iterations=10),
        dataset=e(num_classes=N_CLASSES, semantic_ignore_index=IGNORE),
        train=e(
            sem_ann_loss_types="segsort", sem_occ_loss_types="segsort",
            img_sim_loss_types="segsort", feat_aff_loss_types="none",
            sem_ann_concentration=6.0, sem_occ_concentration=12.0,
            img_sim_concentration=16.0, feat_aff_concentration=0.0,
            sem_ann_loss_weight=1.0, sem_occ_loss_weight=0.5,
            img_sim_loss_weight=0.1, feat_aff_loss_weight=0.0),
    )


def build_models(seed):
    lp._install_reference()
    import torch
    torch.manual_seed(seed)
    from spml.models.embeddings.resnet_deeplab import resnet_50_deeplab
    from spml.models.predictions.segsort import segsort

    cfg = reference_config()
    emb = resnet_50_deeplab(cfg)
    pred = segsort(cfg)
    # From-random-init regime: see module docstring.
    for m in emb.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.momentum = 0.1
    return emb, pred, cfg


def make_loader(root, batch, seed=0):
    """Train batches through OUR (reference-equivalent) data pipeline."""
    from spml_tpu.data import datasets

    ds = datasets.ListTagDataset(
        root, os.path.join(root, "train.txt"),
        img_mean=(0.485, 0.456, 0.406), img_std=(0.229, 0.224, 0.225),
        size=(128, 128), random_crop=True, random_scale=True,
        random_mirror=True, training=True, seed=seed)
    rng = np.random.RandomState(seed)

    def next_batch(it):
        idx = rng.randint(0, len(ds), size=batch)
        items = [ds[int(i)] for i in idx]
        return {
            "image": np.stack([x["image"] for x in items]),
            "semantic_label": np.stack(
                [x["semantic_label"] for x in items]),
            "instance_label": np.stack(
                [x["instance_label"] for x in items]),
            "semantic_tag": np.stack(
                [x["semantic_tag"] for x in items]),
        }
    return next_batch


def train_reference(emb, pred, n_iters, next_batch,
                    base_lr=3e-3, wd=5e-4, momentum=0.9,
                    memory_bank_size=2, batch=8, log_every=20):
    import torch

    import spml.models.utils as model_utils
    import spml.utils.general.train as train_utils
    from lib.nn.optimizer import SGD
    model_utils.scatter_gather = lp._CpuGatherShim
    lp._patch_cpu_device_index()

    groups = emb.get_params_lr() + pred.get_params_lr()
    optimizer = SGD(groups, lr=1, momentum=momentum, weight_decay=wd)

    emb.train()
    pred.train()
    memory_banks = {}
    for it in range(n_iters):
        b = next_batch(it)
        image = torch.from_numpy(
            b["image"].transpose(0, 3, 1, 2).copy()).float()
        label_batch = {
            "semantic_label": torch.from_numpy(
                b["semantic_label"].copy()).long(),
            "instance_label": torch.from_numpy(
                b["instance_label"].copy()).long(),
            "semantic_tag": torch.from_numpy(
                b["semantic_tag"].copy()).float(),
        }
        embeddings = emb({"image": image}, label_batch)

        (protos, protos_loc, p_sem, p_inst, p_batch, c_inds) = (
            model_utils.gather_clustering_and_update_prototypes(
                [embeddings["cluster_embedding"]],
                [embeddings["cluster_embedding_with_loc"]],
                [embeddings["cluster_index"]],
                [embeddings["cluster_batch_index"]],
                [embeddings["cluster_semantic_label"]],
                [embeddings["cluster_instance_label"]], None))
        label_batch["prototype"] = protos[0]
        label_batch["prototype_with_loc"] = protos_loc[0]
        label_batch["prototype_semantic_label"] = p_sem[0]
        label_batch["prototype_instance_label"] = p_inst[0]
        label_batch["prototype_batch_index"] = p_batch[0]
        embeddings["cluster_index"] = c_inds[0]
        label_batch["prototype_semantic_tag"] = torch.index_select(
            label_batch["semantic_tag"], 0,
            label_batch["prototype_batch_index"])

        for k in memory_banks.keys():
            label_batch[k] = [m for m in memory_banks[k]]

        outputs = pred(embeddings, label_batch)
        losses = []
        for k in ["sem_ann_loss", "sem_occ_loss", "img_sim_loss",
                  "feat_aff_loss"]:
            loss = outputs.get(k, None)
            if loss is not None:
                losses.append(loss.mean())
        total = sum(losses)

        lr = train_utils.lr_poly(base_lr, it, n_iters, 0)
        optimizer.zero_grad()
        total.backward()
        optimizer.step(lr)

        with torch.no_grad():
            for k in list(label_batch.keys()):
                if "prototype" in k and "memory" not in k:
                    mk = "memory_" + k
                    memory_banks.setdefault(mk, []).append(
                        label_batch[k].clone().detach())
                    if len(memory_banks[mk]) > memory_bank_size:
                        memory_banks[mk] = memory_banks[mk][1:]
            for k in ["memory_prototype_batch_index"]:
                if k in memory_banks:
                    for i in range(len(memory_banks[k])):
                        memory_banks[k][i] = memory_banks[k][i] + batch
        if it % log_every == 0 or it == n_iters - 1:
            print(f"iter {it}: loss={float(total):.4f} lr={lr:.5f}",
                  flush=True)


def eval_image(path_root, line, ds):
    """Normalized image + labels for one list line (no aug)."""
    parts = line.split()
    import PIL.Image
    img = np.array(PIL.Image.open(
        os.path.join(path_root, parts[0])).convert("RGB"))
    img = img.astype(np.float32) / 255.0
    img = (img - ds.img_mean) / ds.img_std
    sem = np.array(PIL.Image.open(os.path.join(path_root, parts[1])))
    return img.astype(np.float32), sem


def cluster_image(emb_model, image_np):
    """prototype.py/inference.py recipe for one crop-sized image:
    embeddings -> normalize -> k-means with fake zero labels
    (prototype.py:100-220; image == crop == 160, single window)."""
    import torch

    import spml.utils.general.common as common_utils
    image = torch.from_numpy(
        image_np.transpose(2, 0, 1)[None].copy()).float()
    with torch.no_grad():
        out = emb_model.generate_embeddings(
            {"image": image}, resize_as_input=True)
        e = common_utils.normalize_embedding(
            out["embedding"].permute(0, 2, 3, 1).contiguous())
        e = e.permute(0, 3, 1, 2)
        h, w = e.shape[-2:]
        fake = torch.zeros((1, h, w), dtype=torch.long)
        clustering = emb_model.generate_clusters(e, fake, fake)
    return clustering


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--root", default="/tmp/synth_e2e_ref")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "SYNTH_E2E_REF.json"))
    ap.add_argument("--n_val", type=int, default=12,
                    help="val-split size; see synthetic_e2e.py --n_val "
                         "(train images are drawn first, so the "
                         "trained model is unchanged)")
    args = ap.parse_args()

    rng = np.random.RandomState(7)  # same world as synthetic_e2e.py
    se.make_world(args.root, rng, n_val=args.n_val)

    emb, pred, _cfg = build_models(args.seed)
    next_batch = make_loader(args.root, args.batch, seed=args.seed)

    t0 = time.time()
    train_reference(emb, pred, args.iters, next_batch, batch=args.batch)
    train_s = time.time() - t0
    print(f"reference train: {train_s:.0f}s", flush=True)

    import torch

    import spml.utils.segsort.common as segsort_common
    emb.eval()

    from spml_tpu.data import datasets
    ds = datasets.ListDataset(
        args.root, os.path.join(args.root, "train.txt"),
        img_mean=(0.485, 0.456, 0.406), img_std=(0.229, 0.224, 0.225))

    # --- memory bank over train (prototype.py:184-227) with DENSE
    # labels, exactly as the reference pipeline does
    # (MEMORY_DATA_LIST=panoptic_train+_hed.txt -> segcls,
    # train_spml_scribble.sh:74,137) ---
    with open(os.path.join(args.root, "memory.txt")) as f:
        train_lines = [ln.strip() for ln in f if ln.strip()]
    protos, proto_labels = [], []
    t0 = time.time()
    for ln in train_lines:
        img, mem_label = eval_image(args.root, ln, ds)
        clustering = cluster_image(emb, img)
        with torch.no_grad():
            p = segsort_common.calculate_prototypes_from_labels(
                clustering["cluster_embedding"],
                clustering["cluster_index"])
            sem = torch.from_numpy(
                mem_label.astype(np.int64))[None]
            _, p_lab = segsort_common.find_majority_label_index(
                sem, clustering["cluster_index"])
        protos.append(p)
        proto_labels.append(p_lab)
    memory_protos = torch.cat(protos, 0)
    memory_labels = torch.cat(proto_labels, 0)
    valid = (memory_labels != IGNORE).nonzero().view(-1)
    memory_protos = torch.index_select(memory_protos, 0, valid)
    memory_labels = torch.index_select(memory_labels, 0, valid)
    proto_s = time.time() - t0
    print(f"prototypes: {int(memory_protos.shape[0])} "
          f"({proto_s:.0f}s)", flush=True)

    # --- val KNN inference (inference.py:210-235) ---
    with open(os.path.join(args.root, "val.txt")) as f:
        val_lines = [ln.strip() for ln in f if ln.strip()]
    conf = np.zeros((N_CLASSES, N_CLASSES), np.int64)
    t0 = time.time()
    for ln in val_lines:
        img, gt = eval_image(args.root, ln, ds)
        clustering = cluster_image(emb, img)
        with torch.no_grad():
            out = pred(clustering,
                       {"semantic_memory_prototype": memory_protos,
                        "semantic_memory_prototype_label": memory_labels},
                       with_loss=False, with_prediction=True)
            sem_pred = (out["semantic_prediction"]
                        .view(SIZE, SIZE).numpy().astype(np.int64))
        m = gt != IGNORE
        conf += np.bincount(
            gt[m].astype(np.int64) * N_CLASSES + sem_pred[m],
            minlength=N_CLASSES * N_CLASSES).reshape(N_CLASSES,
                                                     N_CLASSES)
    infer_s = time.time() - t0

    tp = np.diag(conf).astype(np.float64)
    denom = conf.sum(0) + conf.sum(1) - np.diag(conf)
    iou = tp / np.maximum(denom, 1)
    miou = float(iou[denom > 0].mean())
    out = {"iters": args.iters, "n_val": args.n_val,
           "train_s": round(train_s, 1),
           "proto_s": round(proto_s, 1),
           "infer_s": round(infer_s, 1),
           "val_miou": round(miou, 4),
           "class_iou": [round(float(x), 3) for x in iou],
           "note": ("reference torch code from /root/reference on CPU, "
                    "same synthetic world/hparams as SYNTH_E2E.json; "
                    "bn momentum 0.1 and our PIL data pipeline "
                    "(deviations documented in the script docstring)")}
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
