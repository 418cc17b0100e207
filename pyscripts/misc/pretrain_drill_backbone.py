"""CE-pretrain the ResNet backbone on the drill world's dense labels.

The reference NEVER trains from scratch: every recipe initializes from
the CUHK ImageNet .pth (resnet_deeplab.py:222-232, train.py:124-126 in
twke18/SPML). This image has no ImageNet weights (zero egress), so
every drill so far ran from random init — the stated cap on the whole
self-training story (round-4 SYNTH_SELFTRAIN.json). This script builds
the in-image proxy for that init: supervised cross-entropy training of
the SAME backbone on the synthetic drill world's dense GT labels
(a different task — per-pixel CE — from the drills' contrastive SPML
objective), exported as a CUHK-shaped backbone-only .pth that the
pipelines' PRETRAINED env var consumes via driver._load_pretrained.

Analogy to the real pipeline: ImageNet classification pretrain ->
SPML fine-tune becomes dense-CE pretrain -> SPML fine-tune. Only
backbone params + BN statistics are exported (like the ImageNet file);
the ASPP/embedding heads still start random in the drills.

Note: the optimizer here is a plain all-params SGD chain, NOT
optim.make_optimizer — that one freezes stem+res2 (reference
FINE-TUNING semantics, resnet_deeplab.py:176-190); a pretrain must
train every stage.

Usage:
  python pyscripts/misc/pretrain_drill_backbone.py \
      --world /tmp/drill/VOCdevkit [--iters 3000] [--batch 8] \
      [--out /tmp/drill/VOCdevkit/pretrained_synth.pth]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="/tmp/drill/VOCdevkit")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_classes", type=int, default=21,
                    help="dense-label class count of the world "
                         "(21 scribble/tag drill world, 15 densepose)")
    ap.add_argument("--out", default=None,
                    help=".pth path (default <world>/pretrained_synth"
                         ".pth)")
    ap.add_argument("--json", default=os.path.join(
        ROOT, "PRETRAIN_BACKBONE.json"))
    args = ap.parse_args()
    out_pth = args.out or os.path.join(args.world,
                                       "pretrained_synth.pth")

    from spml_tpu.cli import select_platform
    select_platform()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from spml_tpu.config import load_config
    from spml_tpu.data import datasets as datasets_lib
    from spml_tpu.models.embeddings import host_init
    from spml_tpu.models.resnet import RESNET_DEPTHS, ResnetBackbone
    from spml_tpu.models.spp import torch_conv_init
    from spml_tpu.parallel import mesh as mesh_lib
    from spml_tpu.train import optim
    from spml_tpu.train.state import TrainState
    from spml_tpu.train.step import _cross_entropy
    from spml_tpu.utils import torch_export

    cfg = load_config(overrides={
        "dataset": {"num_classes": args.num_classes,
                    "data_dir": args.world},
        "train": {"seed": args.seed, "batch_size": args.batch,
                  "crop_size": [args.crop, args.crop],
                  "max_iteration": args.iters, "base_lr": args.lr,
                  "warmup_iteration": 0,
                  "random_mirror": True, "random_scale": True,
                  "random_crop": True, "shuffle": True},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    from spml_tpu.cli import enable_compilation_cache
    enable_compilation_cache(cfg)

    num_classes = cfg.dataset.num_classes
    ignore = cfg.dataset.semantic_ignore_index

    class CEPretrainModel(nn.Module):
        """backbone -> 1x1 conv logits at stride 8. CE runs at stride 8
        against nearest-downsampled labels: pretraining signal only, no
        need to pay for full-res upsampled logits."""

        @nn.compact
        def __call__(self, images, train=False):
            x = images.astype(jnp.bfloat16)
            _, _, _, res5 = ResnetBackbone(
                RESNET_DEPTHS[args.depth], dtype=jnp.bfloat16,
                bn_momentum=0.9,  # from-scratch (torch 0.1), like the
                                  # drills' BN_MOMENTUM=0.1
                name="resnet_backbone")(x, train)
            logits = nn.Conv(num_classes, (1, 1), use_bias=True,
                             kernel_init=torch_conv_init,
                             name="cls")(res5)
            return logits.astype(jnp.float32)

    model = CEPretrainModel()
    # dense GT list (memory.txt points at segcls, not scribbles);
    # lists live at <world>/lists with paths relative to <world>
    # (make_drill_world.py layout, same as the drill's DATAROOT)
    data_list = os.path.join(args.world, "lists", "memory.txt")
    crop = (args.crop, args.crop)
    dataset = datasets_lib.ListDataset(
        data_dir=args.world,
        data_list=data_list,
        img_mean=cfg.network.pixel_means, img_std=cfg.network.pixel_stds,
        size=crop, random_crop=True, random_scale=True,
        random_mirror=True, training=True, seed=args.seed)
    loader = iter(datasets_lib.Loader(
        dataset, args.batch, shuffle=True, seed=args.seed,
        num_workers=cfg.num_threads))

    variables = host_init(model, jax.random.PRNGKey(77 + args.seed),
                          np.zeros((1, 96, 96, 3), np.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]

    schedule = optim.lr_poly(args.lr, args.iters, 0)
    tx = optax.chain(
        optax.add_decayed_weights(
            cfg.train.weight_decay,
            mask=jax.tree_util.tree_map_with_path(
                lambda kp, _: getattr(kp[-1], "key", "") == "kernel",
                params)),
        optax.scale_by_schedule(schedule),
        optax.trace(decay=cfg.train.momentum),
        optax.scale(-1.0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats,
                       opt_state=tx.init(params), memory=None,
                       rng=jax.random.PRNGKey(args.seed))

    def loss_fn(params, stats, batch):
        logits, mut = model.apply(
            {"params": params, "batch_stats": stats}, batch["image"],
            train=True, mutable=["batch_stats"])
        h8, w8 = logits.shape[1], logits.shape[2]
        labels = batch["semantic_label"].astype(jnp.int32)
        # nearest-downsample labels to the stride-8 grid
        ys = (jnp.arange(h8) * labels.shape[1]) // h8
        xs = (jnp.arange(w8) * labels.shape[2]) // w8
        lab8 = labels[:, ys][:, :, xs]
        ce = _cross_entropy(logits, lab8, num_classes, ignore)
        pred = jnp.argmax(logits, axis=-1)
        valid = lab8 < num_classes
        acc = (jnp.sum((pred == lab8) & valid)
               / jnp.maximum(jnp.sum(valid), 1))
        return ce, ({"loss": ce, "accuracy": acc}, mut["batch_stats"])

    def train_step(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt,
                          memory=None, rng=state.rng), metrics

    mesh = mesh_lib.make_mesh(num_devices=1)
    state = mesh_lib.device_put_replicated(state, mesh)
    step_fn = mesh_lib.shard_train_step(train_step, mesh)

    t0 = time.time()
    hist = []
    for it in range(args.iters):
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()
                 if k in ("image", "semantic_label")}
        batch = mesh_lib.device_put_batch(batch, mesh)
        state, metrics = step_fn(state, batch)
        if it % 200 == 0 or it == args.iters - 1:
            jax.block_until_ready(metrics)
            row = {"iter": it,
                   "loss": round(float(metrics["loss"]), 4),
                   "acc": round(float(metrics["accuracy"]), 4)}
            hist.append(row)
            print(json.dumps(row), flush=True)
    total = time.time() - t0

    params_h = jax.device_get(state.params)
    stats_h = jax.device_get(state.batch_stats)
    out: dict = {}
    torch_export._export_backbone(out, params_h["resnet_backbone"],
                                  stats_h["resnet_backbone"])
    import torch
    torch.save({"embedding_model": {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
        out.items()}}, out_pth)
    summary = {
        "world": args.world, "iters": args.iters, "batch": args.batch,
        "crop": args.crop, "depth": args.depth, "lr": args.lr,
        "seed": args.seed, "num_classes": args.num_classes,
        "train_seconds": round(total, 1),
        "objective": "dense CE at stride 8 on GT segcls (ImageNet-"
                     "pretrain proxy; see module docstring)",
        "final": hist[-1], "history": hist,
        "exported": {"path": out_pth, "keys": len(out),
                     "scope": "backbone params + BN stats only "
                              "(CUHK-file analog)"},
    }
    with open(args.json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out_pth} ({len(out)} tensors) and {args.json}")


if __name__ == "__main__":
    main()
