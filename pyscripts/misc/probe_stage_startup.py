"""Instrument one inference-stage launch to find where startup time
goes on the tunneled chip.

The round-3 pipeline drill showed 20-34 MINUTES between stage start
and the first saved output in prototype.py / inference.py, while the
per-image steady state is 0.2-0.9 s — so ~95% of those stages is
startup. Candidates: model init on device (traced+compiled over the
tunnel), orbax restore, param upload, engine warmup, the first image's
uncached programs (e.g. the per-original-shape resize in
_resize_pred_to). This probe timestamps each phase separately on the
real chip against the drill world + checkpoint.

Usage: python pyscripts/misc/probe_stage_startup.py \
           [--snap /tmp/drill/snap_scribble/stage1] \
           [--world /tmp/drill/VOCdevkit] [--out /tmp/STARTUP_PROBE.json]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                    "..", ".."))
sys.path.insert(0, ROOT)

T0 = time.time()
MARKS = []


def mark(label):
    t = time.time()
    MARKS.append({"phase": label, "t_rel": round(t - T0, 2)})
    print(f"[{t - T0:8.2f}s] {label}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snap", default="/tmp/drill/snap_scribble/stage1")
    ap.add_argument("--world", default="/tmp/drill/VOCdevkit")
    ap.add_argument("--out", default="/tmp/STARTUP_PROBE.json")
    args = ap.parse_args()

    mark("python start")
    from spml_tpu import cli
    cli.select_platform()
    import jax
    import jax.numpy as jnp
    jax.devices()
    mark("jax init (device list)")

    from spml_tpu.config import load_config
    cfg_path = os.path.join(os.path.dirname(args.snap),
                            "config_emb.yaml")
    config = load_config(cfg_path)
    cli.enable_compilation_cache(config)
    mark("config + imports + compilation cache")

    # --- build_eval_models, phase by phase (mirrors cli.py) ---
    from spml_tpu.models.embeddings import (INIT_SAMPLE_HW,
                                            ClassifierHead,
                                            build_embedding_model,
                                            host_init)
    import numpy as _np
    dtype = (jnp.bfloat16 if config.tpu.compute_dtype == "bfloat16"
             else jnp.float32)
    emb_model = build_embedding_model(config.network.backbone_types,
                                      config.network.embedding_dim,
                                      dtype=dtype)
    ih, iw = INIT_SAMPLE_HW
    evars = host_init(emb_model, jax.random.PRNGKey(0),
                      _np.zeros((1, ih, iw, 3), _np.float32))
    mark("emb_model host_init (CPU backend, jitted)")

    cls_model = ClassifierHead(
        num_classes=config.dataset.num_classes,
        hidden_dim=config.network.embedding_dim * 2, dtype=dtype)
    cvars = host_init(
        cls_model, jax.random.PRNGKey(0),
        _np.zeros((1, ih // 4, iw // 4,
                   config.network.embedding_dim), _np.float32))
    mark("cls_model host_init")

    restored = cli._restore_any(config, args.snap, evars, cvars)
    if restored is not None:
        evars, cvars = restored
    mark("orbax/torch restore")

    from spml_tpu.inference import engine as engine_lib
    eng = engine_lib.InferenceEngine(config, emb_model, evars)
    mark("engine ctor")

    warmed = eng.warmup(max_hw=config.test.image_size,
                        kinds=("prototype",))
    mark(f"warmup prototype kind ({len(warmed)} buckets)")

    import numpy as np
    from spml_tpu.data import transforms
    lists = os.path.join(args.world, "lists")
    memory_list = os.path.join(lists, "memory.txt")
    items = []
    for it in cli.iterate_test_images(config, args.world, memory_list):
        items.append(it)
        if len(items) >= 3:
            break
    mark("loaded 3 items via iterate_test_images")
    protos = None
    for i, (_, base, img0, sem0, _) in enumerate(items):
        img = img0
        sem = sem0
        if config.test.image_size > 0:
            img = transforms.resize_with_interpolation(
                img, config.test.image_size, method="bilinear")
            sem = transforms.resize_with_interpolation(
                sem, config.test.image_size, method="nearest")
        protos, labels, valid = eng.build_prototypes(img, sem)[:3]
        mark(f"build_prototypes image {i} shape={img.shape[:2]}")

    # the KNN-predict half: warm + first predict + per-shape resize
    protos = np.random.RandomState(0).randn(512, protos.shape[-1]) \
        .astype(np.float32)
    memory = (jnp.asarray(protos / np.linalg.norm(
                  protos, axis=-1, keepdims=True)),
              jnp.asarray(np.arange(512, dtype=np.int32) % 21),
              jnp.ones((512,), bool))
    warmed = eng.warmup(max_hw=config.test.image_size, memory=memory,
                        kinds=("predict",))
    mark(f"warmup predict kind ({len(warmed)} buckets)")

    for i, (_, base, img0, _, _) in enumerate(items):
        oh, ow = img0.shape[:2]
        img = img0
        if config.test.image_size > 0:
            img = transforms.resize_with_interpolation(
                img, config.test.image_size, method="bilinear")
        pred = eng.predict_semantic(img, *memory)
        mark(f"predict_semantic image {i} shape={img.shape[:2]}")
        from spml_tpu.ops import common
        out = np.asarray(common.resize_labels(
            jnp.asarray(pred[None]), (oh, ow)))[0]
        mark(f"resize_pred_to original ({oh},{ow})")

    with open(args.out, "w") as f:
        json.dump({"marks": MARKS}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
