"""Shared CLI plumbing for the pyscripts entry points.

Behavioral reference: spml/config/parse_args.py:8-53 in twke18/SPML —
identical flag surface (--snapshot_dir --save_dir --cfg_path
--semantic_memory_dir --cam_dir --data_dir --data_list
--kmeans_num_clusters --label_divisor + 6 DenseCRF flags), so the
reference's bash pipelines drive these scripts unchanged.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.config import Config, load_config


def select_platform() -> None:
    """Honor SPML_TPU_PLATFORM=platform[:num_devices] (e.g. `cpu:8`)
    before any computation. Needed because a sitecustomize may
    pre-import jax with an accelerator plugin, making JAX_PLATFORMS /
    XLA_FLAGS env vars ineffective; jax.config.update still works until
    the backend initializes. Lets the bash pipelines and CLIs run on
    CPU for tests/smoke runs."""
    spec = os.environ.get("SPML_TPU_PLATFORM", "")
    if not spec:
        return
    plat, _, n = spec.partition(":")
    try:
        jax.config.update("jax_platforms", plat)
        if plat == "cpu" and n:
            jax.config.update("jax_num_cpu_devices", int(n))
    except RuntimeError as e:  # backend already initialized
        print(f"SPML_TPU_PLATFORM={spec} ignored: {e}")


def parse_args(description: str = "") -> tuple[argparse.Namespace, Config]:
    select_platform()
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--snapshot_dir", required=True, type=str)
    parser.add_argument("--save_dir", type=str)
    parser.add_argument("--cfg_path", required=True, type=str)
    parser.add_argument("--semantic_memory_dir", type=str, default=None)
    parser.add_argument("--cam_dir", type=str, default=None)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--data_list", type=str, default=None)
    parser.add_argument("--kmeans_num_clusters", type=str, default=None,
                        help="H,W")
    parser.add_argument("--label_divisor", type=int, default=None)
    parser.add_argument("--crf_iter_max", type=int, default=10)
    parser.add_argument("--crf_pos_xy_std", type=int, default=1)
    parser.add_argument("--crf_pos_w", type=int, default=3)
    parser.add_argument("--crf_bi_xy_std", type=int, default=67)
    parser.add_argument("--crf_bi_w", type=int, default=4)
    parser.add_argument("--crf_bi_rgb_std", type=int, default=3)
    args = parser.parse_args()

    config = load_config(args.cfg_path)
    enable_compilation_cache(config)
    if args.kmeans_num_clusters:
        config.network.kmeans_num_clusters = tuple(
            int(x) for x in args.kmeans_num_clusters.split(","))
    if args.label_divisor:
        config.network.label_divisor = args.label_divisor
    if args.data_dir:
        config.dataset.data_dir = args.data_dir
    return args, config


def enable_compilation_cache(config) -> None:
    """Point JAX at a persistent compilation cache so multi-minute
    tunnel compiles (inference cluster step per pad bucket) are paid
    once per machine. No-op when tpu.compilation_cache_dir is empty."""
    cache_dir = getattr(config.tpu, "compilation_cache_dir", "")
    if not cache_dir:
        return
    cache_dir = os.path.expanduser(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled: {e}")


def crf_from_args(args):
    from spml_tpu.crf import DenseCRF
    return DenseCRF(iter_max=args.crf_iter_max, pos_w=args.crf_pos_w,
                    pos_xy_std=args.crf_pos_xy_std, bi_w=args.crf_bi_w,
                    bi_xy_std=args.crf_bi_xy_std,
                    bi_rgb_std=args.crf_bi_rgb_std)


def build_eval_models(config, snapshot_dir: str, with_classifier=False):
    """Load the embedding (and optionally classifier) model variables from
    an orbax snapshot (our trainer) or a torch .pth (reference trainer).
    Returns (emb_model, emb_vars[, cls_model, cls_vars])."""
    from spml_tpu.models.embeddings import (
        INIT_SAMPLE_HW, ClassifierHead, build_embedding_model, host_init)
    from spml_tpu.train import step as step_lib

    dtype = (jnp.bfloat16 if config.tpu.compute_dtype == "bfloat16"
             else jnp.float32)
    emb_model = build_embedding_model(config.network.backbone_types,
                                      config.network.embedding_dim,
                                      dtype=dtype)
    ih, iw = INIT_SAMPLE_HW
    evars = host_init(emb_model, jax.random.PRNGKey(0),
                      np.zeros((1, ih, iw, 3), np.float32))
    cls_model = ClassifierHead(
        num_classes=config.dataset.num_classes,
        hidden_dim=config.network.embedding_dim * 2, dtype=dtype)
    cvars = host_init(
        cls_model, jax.random.PRNGKey(0),
        np.zeros((1, ih // 4, iw // 4,
                  config.network.embedding_dim), np.float32))

    restored = _restore_any(config, snapshot_dir, evars, cvars)
    if restored is not None:
        evars, cvars = restored
    if with_classifier:
        return emb_model, evars, cls_model, cvars
    return emb_model, evars


def _restore_any(config, snapshot_dir, evars, cvars):
    """Try orbax checkpoint dir, then torch model-*.pth files."""
    from spml_tpu.utils import checkpoint as ckpt
    ck_dir = os.path.join(snapshot_dir, "checkpoints")
    step = ckpt.latest_step(ck_dir)
    if step is not None:
        # restore the raw pytree (no template) and take the subtrees we
        # need; the snapshot holds the full TrainState
        import orbax.checkpoint as ocp
        with ocp.CheckpointManager(os.path.abspath(ck_dir)) as mgr:
            restored = mgr.restore(step)
        params = restored["params"]
        stats = restored["batch_stats"]
        if "embedding" in params:
            evars = {"params": params["embedding"],
                     "batch_stats": stats["embedding"]}
        else:
            # stage-2 classifier snapshot: only the prediction head is
            # stored; the frozen embedding comes from network.pretrained
            # (the stage-1 snapshot), as in the reference's classifier
            # inference (train_classifier.py:99-113)
            pre = config.network.pretrained
            if pre and os.path.isdir(pre):
                restored_pre = _restore_any(config, pre, evars, cvars)
                if restored_pre is not None:
                    evars = restored_pre[0]
            elif pre and os.path.isfile(pre):
                from spml_tpu.utils import torch_import
                p, s = torch_import.load_torch_checkpoint(
                    pre, key="embedding_model")
                evars = torch_import.merge_pretrained(
                    evars, p, s, strict_shapes=False, strict_names=False)
        if "prediction" in params:
            cvars = {"params": params["prediction"],
                     "batch_stats": stats["prediction"]}
        return evars, cvars

    # torch .pth fallback (reference snapshot layout, train.py:295-304)
    pth = os.path.join(
        snapshot_dir, f"model-{config.train.max_iteration - 1}.pth")
    if os.path.isfile(pth):
        from spml_tpu.utils import torch_import
        params, stats = torch_import.load_torch_checkpoint(
            pth, key="embedding_model")
        evars = torch_import.merge_pretrained(evars, params, stats,
                                              strict_names=False)
        cparams, cstats = torch_import.load_torch_checkpoint(
            pth, key="prediction_model")
        cvars = torch_import.merge_pretrained(cvars, cparams, cstats,
                                              strict_names=False)
        return evars, cvars
    return None


def save_semantic_pngs(pred: np.ndarray, base_name: str, save_dir: str,
                       color_map=None) -> None:
    """Gray + color PNG outputs in the reference's directory layout
    (semantic_gray/, semantic_color/)."""
    import PIL.Image

    from spml_tpu.utils import vis
    gray_dir = os.path.join(save_dir, "semantic_gray")
    rgb_dir = os.path.join(save_dir, "semantic_color")
    os.makedirs(gray_dir, exist_ok=True)
    os.makedirs(rgb_dir, exist_ok=True)
    PIL.Image.fromarray(pred.astype(np.uint8), mode="L").save(
        os.path.join(gray_dir, base_name))
    if color_map is None:
        color_map = vis.voc_colormap()
    PIL.Image.fromarray(vis.label_to_color(pred, color_map),
                        mode="RGB").save(os.path.join(rgb_dir, base_name))


def iterate_test_images(config, data_dir, data_list):
    """Yields (index, base_name, image[H,W,3] normalized, sem, inst).

    Loads one item ahead on a background thread (PIL/numpy release the
    GIL) so the next image's decode + normalization overlap the
    caller's device work; the reference loads serially per image
    (inference.py:114-124)."""
    import concurrent.futures
    from spml_tpu.data import datasets
    ds = datasets.ListDataset(
        data_dir, data_list, img_mean=config.network.pixel_means,
        img_std=config.network.pixel_stds, size=None, training=False)

    def _load(i):
        item = ds[i]
        base = os.path.basename(ds.image_paths[i])
        base = os.path.splitext(base)[0] + ".png"
        return (i, base, item["image"], item.get("semantic_label"),
                item.get("instance_label"))

    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        fut = pool.submit(_load, 0) if len(ds) else None
        for i in range(len(ds)):
            cur = fut.result()
            fut = pool.submit(_load, i + 1) if i + 1 < len(ds) else None
            yield cur


def denormalize_image(image: np.ndarray, config) -> np.ndarray:
    """Back to uint8 RGB for the CRF (pseudo_camrw_crf.py:172-178)."""
    img = image * np.asarray(config.network.pixel_stds, np.float32)
    img = img + np.asarray(config.network.pixel_means, np.float32)
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)
