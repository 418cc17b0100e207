"""Training loop drivers shared by the train CLIs.

Behavioral reference: pyscripts/train/train.py:41-313 and
train_classifier.py:54-189 in twke18/SPML — the setup / loop / snapshot
skeleton around the jitted step; tensorboard scalars + image panels every
tensorboard_step (vis.py:15-101), snapshots every snapshot_step.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.data import datasets as datasets_lib
from spml_tpu.parallel import mesh as mesh_lib
from spml_tpu.train import classifier_step as cstep_lib
from spml_tpu.train import step as step_lib
from spml_tpu.utils import checkpoint as ckpt
from spml_tpu.utils import vis


def _writer(snapshot_dir):
    try:
        import tensorboardX
        return tensorboardX.SummaryWriter(logdir=snapshot_dir)
    except Exception:  # pragma: no cover - tensorboard optional
        return None


def _load_pretrained(config, state):
    """config.network.pretrained: torch .pth (CUHK resnet-101 naming) or
    orbax dir; merged into the embedding params
    (reference train.py:124-126)."""
    path = config.network.pretrained
    if not path or not os.path.exists(path):
        if path:
            print(f"pretrained not found, training from scratch: {path}")
        return state
    from spml_tpu.utils import torch_import
    params, stats = torch_import.load_torch_checkpoint(
        path, key="embedding_model", cuhk_names=True)
    evars = {"params": state.params["embedding"],
             "batch_stats": state.batch_stats["embedding"]}
    evars = torch_import.merge_pretrained(evars, params, stats,
                                          strict_shapes=False,
                                          strict_names=False)
    new_params = dict(state.params)
    new_params["embedding"] = evars["params"]
    new_stats = dict(state.batch_stats)
    new_stats["embedding"] = evars["batch_stats"]
    print(f"loaded pretrained weights from {path}")
    return state.replace(params=new_params, batch_stats=new_stats)


def _log_metrics(writer, metrics, step, prefix=""):
    line = " ".join(f"{k}={float(v):.4f}" for k, v in sorted(
        metrics.items()) if np.ndim(v) == 0)
    print(f"iter {step}: {line}", flush=True)
    if writer is not None:
        for k, v in metrics.items():
            if np.ndim(v) == 0:
                writer.add_scalar(prefix + k, float(v), step)


def _log_images(writer, config, emb_model, state, batch, step):
    """Tensorboard image panels: colorized semantic/instance labels +
    PCA-RGB embeddings (reference train.py:222-258 + vis.py:15-101)."""
    if writer is None:
        return
    try:
        emb, _ = emb_model.apply(
            {"params": state.params["embedding"],
             "batch_stats": state.batch_stats["embedding"]},
            batch["image"][:2], train=False)
        emb_rgb = vis.embedding_to_rgb(np.asarray(emb))
        cmap = vis.load_color_map(config.dataset.color_map_path)
        sem_rgb = vis.label_to_color(
            np.asarray(batch["semantic_label"][:2], np.int32), cmap)
        inst_rgb = vis.label_to_color(
            np.asarray(batch["instance_label"][:2], np.int32) % 256,
            cmap)
        for i in range(emb_rgb.shape[0]):
            writer.add_image(f"embedding_pca/{i}", emb_rgb[i],
                             step, dataformats="HWC")
            writer.add_image(f"semantic_label/{i}", sem_rgb[i],
                             step, dataformats="HWC")
            writer.add_image(f"instance_label/{i}", inst_rgb[i],
                             step, dataformats="HWC")
    except Exception as e:  # pragma: no cover - vis is best-effort
        print(f"image logging skipped: {e}")


class _TraceWindow:
    """Capture a jax.profiler trace for config.tpu.profile_steps
    iterations starting at iteration config.tpu.profile_start (relative
    to the run's first iteration, so resumed runs trace too). The
    reference has no profiler at all (SURVEY.md §5); traces land in
    config.tpu.profile_dir and open in TensorBoard / ui.perfetto.dev."""

    def __init__(self, config, start_iter):
        self.dir = config.tpu.profile_dir
        self.begin = start_iter + config.tpu.profile_start
        self.end = self.begin + config.tpu.profile_steps
        self.active = False

    def step(self, it, pending=None):
        if not self.dir:
            return
        if it == self.begin and not self.active:
            if pending is not None:
                jax.block_until_ready(pending)  # keep compile/backlog out
            jax.profiler.start_trace(os.path.expanduser(self.dir))
            self.active = True
        elif it == self.end and self.active:
            if pending is not None:
                jax.block_until_ready(pending)  # trace the full steps
            jax.profiler.stop_trace()
            self.active = False
            print(f"profiler trace written to {self.dir}")

    def close(self, pending=None):
        if self.active:
            self.step(self.end, pending)


def train_spml(args, config, dataset_cls=datasets_lib.ListTagDataset):
    """Main SPML contrastive training (reference train.py)."""
    n_dev = max(1, len(jax.devices()))
    config.tpu.num_devices = n_dev
    # with spatial partitioning, only n_dev // spatial devices split the
    # batch axis; the other factor splits each image's height
    data_dev = max(1, n_dev // max(1, config.tpu.spatial_partition))
    global_batch = config.train.batch_size * data_dev
    crop = tuple(config.train.crop_size)

    dataset = dataset_cls(
        data_dir=args.data_dir or config.dataset.data_dir,
        data_list=args.data_list or config.dataset.train_data_list,
        img_mean=config.network.pixel_means,
        img_std=config.network.pixel_stds,
        size=crop, random_crop=config.train.random_crop,
        random_scale=config.train.random_scale,
        random_mirror=config.train.random_mirror, training=True,
        seed=config.train.seed)
    loader = iter(datasets_lib.Loader(
        dataset, global_batch, shuffle=config.train.shuffle,
        seed=config.train.seed,
        num_workers=n_dev * config.num_threads))

    mesh = mesh_lib.make_mesh(spatial=config.tpu.spatial_partition)
    state = step_lib.init_state(
        config, jax.random.PRNGKey(235 + config.train.seed),
        jnp.zeros((global_batch, crop[0], crop[1], 3)))

    ck_dir = os.path.join(args.snapshot_dir, "checkpoints")
    start = config.train.begin_iteration
    if config.train.resume and ckpt.latest_step(ck_dir) is not None:
        start = ckpt.latest_step(ck_dir)
        state = ckpt.restore(ck_dir, state)
        print(f"resumed from iteration {start}")
    else:
        state = _load_pretrained(config, state)

    state = mesh_lib.device_put_replicated(state, mesh)
    emb_model, _ = step_lib.build_models(config)
    train_step = mesh_lib.shard_train_step(
        step_lib.make_train_step(config), mesh)
    writer = _writer(args.snapshot_dir)

    trace = _TraceWindow(config, start)
    t0 = time.time()
    for it in range(start, config.train.max_iteration):
        trace.step(it, pending=state)
        batch = mesh_lib.device_put_batch(
            _to_train_batch(next(loader), config), mesh)
        state, metrics = train_step(state, batch)
        if it % config.train.tensorboard_step == 0:
            jax.block_until_ready(metrics)
            dt = time.time() - t0
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            if it > start:
                metrics["imgs_per_sec"] = (
                    global_batch * config.train.tensorboard_step / dt)
            else:
                # the first interval is dominated by XLA compilation;
                # report it as such instead of a bogus throughput
                metrics["compile_secs"] = dt
            _log_metrics(writer, metrics, it)
            _log_images(writer, config, emb_model, state, batch, it)
            t0 = time.time()
        if ((it + 1) % config.train.snapshot_step == 0
                or it == config.train.max_iteration - 1):
            ckpt.save(ck_dir, it + 1, jax.device_get(state))
            print(f"snapshot at iteration {it + 1}")
    trace.close(pending=state)
    return state


def _to_train_batch(batch, config=None):
    out = {"image": batch["image"],
           "semantic_label": batch["semantic_label"],
           "instance_label": batch["instance_label"]}
    out["semantic_tag"] = batch.get(
        "semantic_tag",
        np.zeros((batch["image"].shape[0], 256), np.int32))
    if config is not None and config.tpu.compact_feed:
        # quarter the host->device bytes: labels are uint8-valued (PNG
        # 'L' mode; pad value 255 == the ignore index) and bf16 convs
        # cast the image on entry anyway, so both casts are exact
        # (locked by tests/test_train_step.py::test_compact_feed_exact)
        out["semantic_label"] = out["semantic_label"].astype(np.uint8)
        out["instance_label"] = out["instance_label"].astype(np.uint8)
        out["semantic_tag"] = out["semantic_tag"].astype(np.uint8)
        if config.tpu.compute_dtype == "bfloat16":
            import ml_dtypes
            out["image"] = out["image"].astype(ml_dtypes.bfloat16)
    return out


def train_classifier(args, config,
                     dataset_cls=datasets_lib.ListTagClassifierDataset):
    """Stage-2 classifier training (reference train_classifier.py)."""
    from spml_tpu.models.embeddings import build_embedding_model

    n_dev = max(1, len(jax.devices()))
    data_dev = max(1, n_dev // max(1, config.tpu.spatial_partition))
    global_batch = config.train.batch_size * data_dev
    crop = tuple(config.train.crop_size)

    dataset = dataset_cls(
        data_dir=args.data_dir or config.dataset.data_dir,
        data_list=args.data_list or config.dataset.train_data_list,
        img_mean=config.network.pixel_means,
        img_std=config.network.pixel_stds,
        size=crop, random_crop=config.train.random_crop,
        random_scale=config.train.random_scale,
        random_mirror=config.train.random_mirror, training=True,
        seed=config.train.seed)
    loader = iter(datasets_lib.Loader(
        dataset, global_batch, shuffle=config.train.shuffle,
        seed=config.train.seed,
        num_workers=n_dev * config.num_threads))

    # frozen embedding model from config.network.pretrained (the stage-1
    # snapshot, train_classifier.py:99-113)
    dtype = (jnp.bfloat16 if config.tpu.compute_dtype == "bfloat16"
             else jnp.float32)
    emb_model = build_embedding_model(config.network.backbone_types,
                                      config.network.embedding_dim,
                                      dtype=dtype)
    from spml_tpu.models.embeddings import INIT_SAMPLE_HW, host_init
    ih, iw = INIT_SAMPLE_HW
    evars = host_init(emb_model, jax.random.PRNGKey(0),
                      np.zeros((1, ih, iw, 3), np.float32))
    pre = config.network.pretrained
    if pre and os.path.isdir(pre):
        # orbax stage-1 snapshot dir
        from spml_tpu.cli import _restore_any
        from spml_tpu.models.embeddings import ClassifierHead
        cls_tmp = ClassifierHead(num_classes=config.dataset.num_classes,
                                 hidden_dim=config.network.embedding_dim * 2)
        cvars_tmp = host_init(
            cls_tmp, jax.random.PRNGKey(0),
            np.zeros((1, ih // 4, iw // 4,
                      config.network.embedding_dim), np.float32))
        restored = _restore_any(config, pre, evars, cvars_tmp)
        if restored is not None:
            evars = restored[0]
            print(f"loaded frozen embedding model from {pre}")
    elif pre and os.path.isfile(pre):
        from spml_tpu.utils import torch_import
        params, stats = torch_import.load_torch_checkpoint(
            pre, key="embedding_model")
        evars = torch_import.merge_pretrained(evars, params, stats,
                                              strict_shapes=False,
                                              strict_names=False)
        print(f"loaded frozen embedding model from {pre}")

    mesh = mesh_lib.make_mesh(spatial=config.tpu.spatial_partition)
    state = cstep_lib.init_classifier_state(
        config, jax.random.PRNGKey(235 + config.train.seed),
        config.network.embedding_dim)
    ck_dir = os.path.join(args.snapshot_dir, "checkpoints")
    start = config.train.begin_iteration
    if config.train.resume and ckpt.latest_step(ck_dir) is not None:
        start = ckpt.latest_step(ck_dir)
        state = ckpt.restore(ck_dir, state)

    state = mesh_lib.device_put_replicated(state, mesh)
    evars = mesh_lib.device_put_replicated(evars, mesh)
    train_step = mesh_lib.shard_train_step(
        cstep_lib.make_classifier_train_step(config, emb_model, evars),
        mesh)
    writer = _writer(args.snapshot_dir)

    trace = _TraceWindow(config, start)
    t0 = time.time()
    for it in range(start, config.train.max_iteration):
        trace.step(it, pending=state)
        batch = mesh_lib.device_put_batch(
            _to_train_batch(next(loader), config), mesh)
        state, metrics = train_step(state, batch)
        if it % config.train.tensorboard_step == 0:
            jax.block_until_ready(metrics)
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            _log_metrics(writer, metrics, it, prefix="classifier/")
        if ((it + 1) % config.train.snapshot_step == 0
                or it == config.train.max_iteration - 1):
            ckpt.save(ck_dir, it + 1, jax.device_get(state))
    trace.close(pending=state)
    return state
