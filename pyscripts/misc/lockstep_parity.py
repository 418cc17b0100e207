"""Lockstep training parity: run OUR SPMD train step and the REFERENCE
torch pipeline (imported from /root/reference, CPU, single device) from
the SAME initial weights on the SAME synthetic batches, and compare the
loss curves iteration by iteration.

What runs on the reference side is the reference's own code —
ResnetDeeplab, SegsortSoftmax.losses, segment_by_kmeans,
gather_clustering_and_update_prototypes, lib.nn.optimizer.SGD, the
memory-bank FIFO from train.py:276-293 — glued together exactly as
pyscripts/train/train.py:154-293 does, with one shim: for a single CPU
device, torch scatter_gather.gather degenerates to identity/concat.

Dropout is zeroed on both sides (the only stochastic op); everything
else is deterministic, so the curves must track closely.

Usage: python pyscripts/misc/lockstep_parity.py [--iters 40]
Writes LOCKSTEP.json at the repo root.
"""

import argparse
import json
import os
import sys
import types

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# Shared scenario
# ---------------------------------------------------------------------------

SCEN = dict(
    batch=2, crop=64, dim=16, num_classes=6, ignore=255,
    kmeans_clusters=(2, 2), kmeans_iterations=10,
    base_lr=3e-3, weight_decay=5e-4, momentum=0.9,
    sem_ann_kappa=6.0, sem_ann_w=1.0,
    sem_occ_kappa=12.0, sem_occ_w=0.5,
    img_sim_kappa=16.0, img_sim_w=0.1,
    memory_bank_size=2,
)


def make_batches(n_iters, seed=0):
    """Deterministic synthetic batches: blobby labels + correlated
    images so the losses have signal."""
    rng = np.random.RandomState(seed)
    B, S, C = SCEN["batch"], SCEN["crop"], SCEN["num_classes"]
    batches = []
    for _ in range(n_iters):
        sem = np.zeros((B, S, S), np.int32)
        inst = np.zeros((B, S, S), np.int32)
        img = rng.rand(B, S, S, 3).astype(np.float32) * 0.1
        for b in range(B):
            for k in range(4):
                cy, cx = rng.randint(0, S, 2)
                r = rng.randint(8, 24)
                yy, xx = np.mgrid[0:S, 0:S]
                m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
                cls = rng.randint(1, C)
                sem[b][m] = cls
                inst[b][m] = k + 1
                img[b][m] += np.asarray(rng.rand(3), np.float32)
            # a few ignore pixels
            iy, ix = rng.randint(0, S, 10), rng.randint(0, S, 10)
            sem[b, iy, ix] = SCEN["ignore"]
        img = np.clip(img, 0, 1)
        tags = np.zeros((B, 256), np.int32)
        for b in range(B):
            u = np.unique(sem[b])
            tags[b, u[u < 256]] = 1
        batches.append({"image": img, "semantic_label": sem,
                        "instance_label": inst, "semantic_tag": tags})
    return batches


# ---------------------------------------------------------------------------
# Reference (torch) side
# ---------------------------------------------------------------------------

class _edict(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def _reference_config():
    s = SCEN
    return _edict(
        network=_edict(embedding_dim=s["dim"], label_divisor=255,
                       kmeans_num_clusters=list(s["kmeans_clusters"]),
                       kmeans_iterations=s["kmeans_iterations"]),
        dataset=_edict(num_classes=s["num_classes"],
                       semantic_ignore_index=s["ignore"]),
        train=_edict(
            sem_ann_loss_types="segsort", sem_occ_loss_types="segsort",
            img_sim_loss_types="segsort", feat_aff_loss_types="none",
            sem_ann_concentration=s["sem_ann_kappa"],
            sem_occ_concentration=s["sem_occ_kappa"],
            img_sim_concentration=s["img_sim_kappa"],
            feat_aff_concentration=0.0,
            sem_ann_loss_weight=s["sem_ann_w"],
            sem_occ_loss_weight=s["sem_occ_w"],
            img_sim_loss_weight=s["img_sim_w"],
            feat_aff_loss_weight=0.0),
    )


def _install_reference():
    if "easydict" not in sys.modules:
        mod = types.ModuleType("easydict")
        mod.EasyDict = _edict
        sys.modules["easydict"] = mod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


class _CpuGatherShim:
    """Single-CPU-device replacement for torch scatter_gather inside
    spml.models.utils: gather over one device = identity (tensor lists
    of length 1) — the multi-GPU concat degenerates to a no-op."""

    @staticmethod
    def gather(outputs, device, dim=0):
        import torch
        if torch.is_tensor(outputs):
            return outputs
        if isinstance(outputs, (list, tuple)):
            if len(outputs) == 1:
                return _CpuGatherShim.gather(outputs[0], device, dim)
            if torch.is_tensor(outputs[0]):
                return torch.cat(list(outputs), dim)
        return outputs


def _patch_cpu_device_index():
    """segment_by_kmeans reads tensor.device.index (common.py:376),
    which is None on CPU. Re-exec the function with `or 0` so the
    multi-GPU batch-offset hack degenerates correctly on one CPU device.
    Everything else in the module is untouched."""
    import inspect

    import spml.utils.segsort.common as segsort_common
    if getattr(segsort_common.segment_by_kmeans, "_cpu_patched", False):
        return
    src = inspect.getsource(segsort_common.segment_by_kmeans)
    needle = "gpu_id = cur_cluster_indices.device.index"
    assert needle in src, "reference segment_by_kmeans changed"
    src = src.replace(needle, needle + " or 0")
    ns = dict(segsort_common.__dict__)
    exec(src, ns)  # noqa: S102 - reference code, modified one expression
    ns["segment_by_kmeans"]._cpu_patched = True
    segsort_common.segment_by_kmeans = ns["segment_by_kmeans"]
    # the embedding models captured the symbol via their module import
    import spml.models.embeddings.resnet_deeplab as rd
    rd.segsort_common.segment_by_kmeans = ns["segment_by_kmeans"]


def build_reference_models(seed=0):
    _install_reference()
    import torch
    torch.manual_seed(seed)
    from spml.models.embeddings.resnet_deeplab import resnet_50_deeplab
    from spml.models.predictions.segsort_softmax import segsort

    cfg = _reference_config()
    emb = resnet_50_deeplab(cfg)
    pred = segsort(cfg)
    # deterministic lockstep: zero the only stochastic op
    for m in pred.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return emb, pred, cfg


def save_reference_checkpoint(emb, pred, path):
    import torch
    torch.save({"embedding_model": emb.state_dict(),
                "prediction_model": pred.state_dict()}, path)


def run_reference(emb_model, pred_model, cfg, batches):
    """The train.py:154-293 loop for one CPU device."""
    import torch

    import spml.models.utils as model_utils
    import spml.utils.general.train as train_utils
    model_utils.scatter_gather = _CpuGatherShim
    _patch_cpu_device_index()
    s = SCEN

    from lib.nn.optimizer import SGD
    param_groups = (emb_model.get_params_lr()
                    + pred_model.get_params_lr())
    optimizer = SGD(param_groups, lr=1, momentum=s["momentum"],
                    weight_decay=s["weight_decay"])

    emb_model.train()
    pred_model.train()
    memory_banks = {}
    curve = []
    n_iters = len(batches)
    for it, b in enumerate(batches):
        image = torch.from_numpy(
            b["image"].transpose(0, 3, 1, 2).copy()).float()
        sem = torch.from_numpy(b["semantic_label"].copy()).long()
        inst = torch.from_numpy(b["instance_label"].copy()).long()
        tags = torch.from_numpy(b["semantic_tag"].copy()).float()
        image_batch = {"image": image}
        label_batch = {"semantic_label": sem, "instance_label": inst,
                       "semantic_tag": tags}

        embeddings = emb_model(image_batch, label_batch)

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
            tags, 0, label_batch["prototype_batch_index"])

        for k in memory_banks.keys():
            label_batch[k] = [m for m in memory_banks[k]]

        outputs = pred_model(embeddings, label_batch)
        losses, log = [], {}
        for k in ["sem_ann_loss", "sem_occ_loss", "img_sim_loss",
                  "feat_aff_loss"]:
            loss = outputs.get(k, None)
            if loss is not None:
                log[k] = float(loss.mean())
                losses.append(loss.mean())
        total = sum(losses)
        log["loss"] = float(total)
        curve.append(log)

        lr = train_utils.lr_poly(s["base_lr"], it, n_iters, 0)
        optimizer.zero_grad()
        total.backward()
        optimizer.step(lr)

        # memory bank FIFO (train.py:276-293)
        with torch.no_grad():
            for k in list(label_batch.keys()):
                if "prototype" in k and "memory" not in k:
                    memory = label_batch[k].clone().detach()
                    mk = "memory_" + k
                    memory_banks.setdefault(mk, []).append(memory)
                    if len(memory_banks[mk]) > s["memory_bank_size"]:
                        memory_banks[mk] = memory_banks[mk][1:]
            for k in ["memory_prototype_batch_index"]:
                if k in memory_banks:
                    for i in range(len(memory_banks[k])):
                        memory_banks[k][i] = (memory_banks[k][i]
                                              + s["batch"])
    return curve


# ---------------------------------------------------------------------------
# Our (jax) side
# ---------------------------------------------------------------------------

def _our_config():
    from spml_tpu.config import load_config
    s = SCEN
    return load_config(overrides={
        "dataset": {"num_classes": s["num_classes"]},
        "network": {"backbone_types": "panoptic_deeplab_50",
                    "embedding_dim": s["dim"],
                    "kmeans_num_clusters": list(s["kmeans_clusters"]),
                    "kmeans_iterations": s["kmeans_iterations"]},
        "train": {"batch_size": s["batch"],
                  "crop_size": [s["crop"], s["crop"]],
                  "memory_bank_size": s["memory_bank_size"],
                  "base_lr": s["base_lr"],
                  "weight_decay": s["weight_decay"],
                  "momentum": s["momentum"],
                  "max_iteration": 0,  # set per run below
                  "sem_ann_concentration": s["sem_ann_kappa"],
                  "sem_occ_concentration": s["sem_occ_kappa"],
                  "img_sim_concentration": s["img_sim_kappa"],
                  "sem_ann_loss_weight": s["sem_ann_w"],
                  "sem_occ_loss_weight": s["sem_occ_w"],
                  "img_sim_loss_weight": s["img_sim_w"],
                  "feat_aff_loss_types": "none"},
        "tpu": {"compute_dtype": "float32", "segment_capacity": 64},
    })


def run_ours(ckpt_path, batches):
    import jax
    import jax.numpy as jnp

    from spml_tpu.models.embeddings import ClassifierHead
    from spml_tpu.train import step as step_lib
    from spml_tpu.utils import torch_import

    cfg = _our_config()
    cfg.train.max_iteration = len(batches)
    s = SCEN
    emb_model, _ = step_lib.build_models(cfg)
    # deterministic lockstep: dropout off (as on the torch side)
    cls_model = ClassifierHead(num_classes=s["num_classes"],
                               hidden_dim=s["dim"] * 2,
                               dropout_rate=0.0, dtype=jnp.float32)

    state = step_lib.init_state(
        cfg, jax.random.PRNGKey(0),
        jnp.zeros((s["batch"], s["crop"], s["crop"], 3)))
    eparams, estats = torch_import.load_torch_checkpoint(
        ckpt_path, key="embedding_model")
    evars = torch_import.merge_pretrained(
        {"params": state.params["embedding"],
         "batch_stats": state.batch_stats["embedding"]},
        eparams, estats)
    pparams, pstats = torch_import.load_torch_checkpoint(
        ckpt_path, key="prediction_model")
    cvars = torch_import.merge_pretrained(
        {"params": state.params["prediction"],
         "batch_stats": state.batch_stats["prediction"]},
        pparams, pstats)
    state = state.replace(
        params={"embedding": evars["params"],
                "prediction": cvars["params"]},
        batch_stats={"embedding": evars["batch_stats"],
                     "prediction": cvars["batch_stats"]})

    step_fn = jax.jit(step_lib.make_train_step(cfg, emb_model, cls_model))
    curve = []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, batch)
        log = {k: float(metrics[k]) for k in
               ("sem_ann_loss", "sem_occ_loss", "img_sim_loss", "loss")
               if k in metrics}
        curve.append(log)
    return curve


# ---------------------------------------------------------------------------
# Comparison
# ---------------------------------------------------------------------------

def compare(ref_curve, our_curve):
    keys = ["loss", "sem_ann_loss", "sem_occ_loss", "img_sim_loss"]
    out = {"iters": len(ref_curve), "per_key": {}}
    for k in keys:
        r = np.asarray([c[k] for c in ref_curve])
        o = np.asarray([c[k] for c in our_curve])
        rel = np.abs(r - o) / np.maximum(np.abs(r), 1e-6)
        out["per_key"][k] = {
            "ref_first": float(r[0]), "ours_first": float(o[0]),
            "ref_last": float(r[-1]), "ours_last": float(o[-1]),
            "max_rel_diff": float(rel.max()),
            "mean_rel_diff": float(rel.mean()),
            "first_rel_diff": float(rel[0]),
        }
        if len(r) >= 3:
            out["per_key"][k]["curve_corr"] = float(
                np.corrcoef(r, o)[0, 1])
        if len(r) >= 100:
            # drift diagnostics for long horizons: how fast the two
            # implementations separate (slope of rel diff per 100
            # iters) and where they end up (mean over the last 50).
            it = np.arange(len(rel), dtype=np.float64)
            slope = float(np.polyfit(it, rel, 1)[0])
            out["per_key"][k]["drift_slope_per_100_iters"] = slope * 100
            out["per_key"][k]["mean_rel_diff_last50"] = float(
                rel[-50:].mean())
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=40)
    parser.add_argument("--out", default=os.path.join(ROOT,
                                                      "LOCKSTEP.json"))
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import tempfile
    emb, pred, cfg_ref = build_reference_models()
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "init.pth")
        save_reference_checkpoint(emb, pred, ck)
        batches = make_batches(args.iters)
        print("running reference torch pipeline ...", flush=True)
        ref_curve = run_reference(emb, pred, cfg_ref, batches)
        print("running our train step ...", flush=True)
        our_curve = run_ours(ck, batches)

    result = compare(ref_curve, our_curve)
    result["ref_curve"] = ref_curve
    result["our_curve"] = our_curve
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    for k, v in result["per_key"].items():
        print(f"{k}: first {v['ref_first']:.4f}/{v['ours_first']:.4f} "
              f"last {v['ref_last']:.4f}/{v['ours_last']:.4f} "
              f"max_rel {v['max_rel_diff']:.4f} "
              f"corr {v.get('curve_corr', float('nan')):.4f}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, ROOT)
    main()
