"""Configuration schema.

Mirrors the reference's YAML surface (spml/config/default.py in
twke18/SPML — network/dataset/train/test sections with identical key
names so the reference's config templates load unchanged), plus a `tpu`
section for the static-shape / SPMD knobs the TPU re-design introduces.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class NetworkConfig:
    pixel_means: tuple = (0.485, 0.456, 0.406)
    pixel_stds: tuple = (0.229, 0.224, 0.225)
    pretrained: str = ""
    use_syncbn: bool = True  # informational: SPMD BN is always synced
    backbone_types: str = "panoptic_deeplab_101"
    prediction_types: str = "segsort"
    aspp_feature_dim: int = 512
    pspp_feature_dim: int = 512
    embedding_dim: int = 64
    label_divisor: int = 255
    # torch momentum (reference 3e-4); assumes pretrained BN statistics.
    # Use ~0.1 when training from scratch so eval-mode stats keep up.
    bn_momentum: float = 3e-4
    kmeans_iterations: int = 10
    kmeans_num_clusters: tuple = (6, 6)


@dataclass
class DatasetConfig:
    data_dir: str = ""
    train_data_list: str = ""
    test_data_list: str = ""
    color_map_path: str = ""
    num_classes: int = 21
    semantic_ignore_index: int = 255


@dataclass
class TrainConfig:
    lr_policy: str = "poly"
    # ours-only: deterministic seed offset for init/shuffle/augmentation
    # (the reference never seeds — every reference run is an implicit
    # fresh seed). 0 reproduces the historical default streams bitwise.
    seed: int = 0
    random_mirror: bool = True
    random_scale: bool = True
    random_crop: bool = True
    shuffle: bool = True
    resume: bool = False
    begin_iteration: int = 0
    max_iteration: int = 30000
    warmup_iteration: int = 0  # reference default.py:50 (bash sets 100)
    decay_iterations: tuple = ()
    snapshot_step: int = 10000
    tensorboard_step: int = 100
    base_lr: float = 3e-3
    weight_decay: float = 5e-4
    momentum: float = 0.9
    # 'sgd' (the reference's shipped pipelines) or 'adam'
    # (lib/nn/optimizer.py:107-179 — part of the reference's optimizer
    # surface; same per-group LR multipliers / wd masks either way)
    optimizer: str = "sgd"
    batch_size: int = 4           # per the reference: per-device batch
    crop_size: tuple = (512, 512)
    memory_bank_size: int = 2
    sem_ann_loss_types: str = "segsort"
    sem_occ_loss_types: str = "segsort"
    img_sim_loss_types: str = "segsort"
    feat_aff_loss_types: str = "none"
    sem_ann_concentration: float = 6.0
    sem_occ_concentration: float = 12.0
    img_sim_concentration: float = 16.0
    feat_aff_concentration: float = 0.0
    sem_ann_loss_weight: float = 1.0
    sem_occ_loss_weight: float = 0.5
    img_sim_loss_weight: float = 0.1
    feat_aff_loss_weight: float = 0.0


@dataclass
class TestConfig:
    # parsed for YAML-surface parity with the reference (default.py:77,
    # where it is likewise never read: every reference inference script
    # hardcodes its pyramid — see tests/test_cli_wrappers.py)
    scales: tuple = (1.0,)
    image_size: int = 512
    crop_size: tuple = (512, 512)
    stride: tuple = (512, 512)


@dataclass
class TpuConfig:
    """Static-shape & SPMD knobs (no reference counterpart)."""
    # max distinct (cluster, semantic, instance) segments per image
    segment_capacity: int = 256
    # value bound used to pack labels into sort keys
    label_cap: int = 256
    # number of data-parallel devices the step is laid out for
    num_devices: int = 1
    # shard the image HEIGHT axis over this many devices (2-D
    # ('data','space') mesh; GSPMD inserts conv halo exchanges) — lets
    # crops/batches too large for one chip's HBM train unchanged. The
    # device count must be divisible; data-parallel width becomes
    # num_devices // spatial_partition. Validated N-dev == 1-dev in
    # tests/test_spatial_partition.py.
    spatial_partition: int = 1
    # compute dtype for the conv backbone ('bfloat16' | 'float32')
    compute_dtype: str = "bfloat16"
    # width of the dataset-level tag vector (reference uses 256)
    tag_width: int = 256
    # use the fused Pallas pixel-prototype loss kernel for sem_ann.
    # O(N+P) memory instead of O(N*P): slightly slower than dense XLA at
    # small prototype counts but required for large batches / memory banks
    # where the dense similarity matrix would not fit.
    use_fused_loss: bool = False
    # operand dtype for the fused loss kernels' embedding/prototype
    # reads ('' = float32). bf16 halves the kernels' HBM bytes and runs
    # the logits matmuls single-pass on the MXU, with f32 accumulation
    # and exact-f32 cotangents — but MEASURED NEUTRAL on v5e (34.5 vs
    # 35.3 ms joint fwd+bwd at full fill: the kernel is VPU-issue-bound
    # on the masked elementwise passes, not byte-bound; PERF.md).
    # Default stays f32 for exact numerics; the knob remains a lever
    # for geometries where the sweep does go bandwidth-bound (numerics
    # delta quantified in tests/test_pallas_loss.py).
    loss_operand_dtype: str = ""
    # loss reduction across the global batch:
    # 'per_device_mean' (default) = mean over each train.batch_size image
    #   group's valid pixels, then mean over groups — the reference's
    #   per-GPU-mean-then-mean-over-GPUs (train.py:211-219, torch.mean of
    #   each GPU's selected pixels);
    # 'global_mean' = one masked mean over every valid pixel of the
    #   global batch (equal pixel weighting; differs when per-group valid
    #   counts are skewed — quantified in tests/test_loss_reduction.py).
    loss_reduction: str = "per_device_mean"
    # inference: round padded shapes up to crop + k*stride so the set of
    # compiled programs stays small (padding carries ignore labels, so
    # results are unchanged modulo the sliding-window grid)
    pad_to_stride_buckets: bool = True
    # bulk single-scale KNN inference: group this many same-bucket
    # images into ONE vmapped program with the image axis sharded over
    # the device mesh (engine.predict_semantic_batch) — bulk throughput
    # scales with chips; outputs bit-identical to the per-image path
    # (tests/test_batch_inference.py). 1 = per-image (default).
    infer_batch: int = 1
    # JAX persistent compilation cache directory ('' disables); warmup
    # compiles are then paid once per machine, not per process
    compilation_cache_dir: str = "~/.cache/spml_tpu_xla"
    # training feed: upload labels as uint8 (PNG 'L'-mode values; the
    # step widens to int32 on device) and images in the compute dtype
    # (bf16 convs cast on entry anyway) — 4x fewer host->device bytes
    # per step, exact (tests/test_train_step.py::test_compact_feed_exact)
    compact_feed: bool = True
    # compute the top-5 prototype retrieval accuracy metric only on
    # steps where it is actually logged (state.step % tensorboard_step
    # == 0). The reference computes it every step but only logs it every
    # tensorboard_step (train.py:222-258), so the observable behavior is
    # identical; skipping it saves ~6.7 ms/step at flagship scale.
    lazy_metrics: bool = True
    # capture a jax.profiler device trace (XPlane/Perfetto, viewable in
    # TensorBoard or ui.perfetto.dev) during training: profile_steps
    # iterations starting at iteration profile_start are traced into
    # profile_dir ('' disables). The window starts after warmup so the
    # trace shows steady-state steps, not XLA compilation.
    profile_dir: str = ""
    profile_start: int = 10
    profile_steps: int = 5
    # DensePose feat_aff term: the reference CONSTRUCTS feat_aff_loss in
    # every predictor (segsort_softmax_densepose.py:64-68) but its
    # effective objective never invokes it (:195-254 — no call), so the
    # shipped DensePose 44.15 mIoU was trained WITHOUT the term. Default
    # False reproduces that effective objective even when the config
    # surface carries feat_aff types/weights (as the reference's shipped
    # bash defaults do); True enables the paper-semantics term (the
    # NN-propagated tag set-loss at feat_aff concentration/weight).
    apply_feat_aff: bool = False
    # per-residual-block rematerialization in the backbone: save only
    # block boundaries, recompute intra-block conv/BN/relu activations
    # during backward (models/resnet.py::Stage.remat). The memory lever
    # for larger batch/crop; measured throughput effect in PERF.md.
    remat_backbone: bool = False
    # selective variant: remat ONLY these backbone stages (e.g. [4] or
    # [4, 5] for the bandwidth-heavy dilated stages); overrides
    # remat_backbone when non-empty. Measured effect in PERF.md.
    remat_stages: tuple = ()


@dataclass
class Config:
    network: NetworkConfig = field(default_factory=NetworkConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    tpu: TpuConfig = field(default_factory=TpuConfig)
    gpus: str = ""          # accepted for reference-compat; unused
    num_threads: int = 4


def _merge(dc, values: dict[str, Any]):
    for k, v in values.items():
        if not hasattr(dc, k):
            continue
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge(cur, v)
        else:
            if isinstance(cur, tuple) and isinstance(v, list):
                v = tuple(v)
            if isinstance(cur, float):
                v = float(v)
            elif isinstance(cur, int) and not isinstance(cur, bool):
                v = int(v) if not isinstance(v, bool) else v
            setattr(dc, k, v)


def load_config(path: str | None = None,
                overrides: dict[str, Any] | None = None) -> Config:
    """Build a Config, optionally merging a reference-format YAML and a
    nested override dict (update_config semantics, default.py:83-103)."""
    cfg = Config()
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        _merge(cfg, data)
    if overrides:
        _merge(cfg, overrides)
    return cfg
