"""Pixel-embedding models (DeepLab-v2 / PSPNet heads over ResNet) and the
softmax classifier heads, in flax/NHWC.

Behavioral reference in twke18/SPML:
* spml/models/embeddings/resnet_deeplab.py (ResnetDeeplab:16 —
  backbone -> ASPP(no bn/relu) -> 2x bilinear upsample -> stride-4
  embeddings + location features; factories :234-243);
* spml/models/embeddings/resnet_pspnet.py:36-40 (PSPP(2048->512,bn,relu)
  + 1x1 conv -> dim);
* spml/models/embeddings/resnet_pspnet_densepose.py:38-44 (same head,
  LFN uses color+location, norm_color, smooth_ksize 5);
* spml/models/predictions/segsort_softmax.py:22-37 (classifier head:
  conv3x3 no-bias -> BN -> ReLU -> Dropout .75 -> conv1x1) and
  spml/models/predictions/softmax_classifier.py:15-29 (same, Dropout .65).

The clustering half of the reference model's forward (generate_clusters)
lives in spml_tpu/ops/kmeans.py and is composed in the train step — it is
algorithm, not architecture.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.models import local as local_model
from spml_tpu.models.resnet import RESNET_DEPTHS, ResnetBackbone
from spml_tpu.models.spp import ASPP, PSPP, resize_bilinear, torch_conv_init


class EmbeddingModel(nn.Module):
    """backbone -> spp head -> x2 upsample -> [B, H/4, W/4, dim] embeddings.

    Returns (embedding, local_feature); `local_feature` matches the
    embedding's spatial size.
    """
    depth: int = 101
    head: str = "aspp"  # 'aspp' (deeplab) | 'pspp' (pspnet)
    embedding_dim: int = 64
    # LocationColorNetwork flavor
    use_color: bool = False
    norm_color: bool = False
    smooth_ksize: int | None = None
    dtype: Any = jnp.float32
    # reference BN momentum 3e-4 assumes ImageNet-pretrained statistics;
    # raise (e.g. 0.9) when training from random initialization or the
    # eval-mode running stats lag the train-mode batch stats badly
    bn_momentum: float = 1.0 - 3e-4
    # per-residual-block rematerialization: bool (all stages) or a
    # (res2, res3, res4, res5) tuple for selective stage remat
    # (see resnet.ResnetBackbone.remat)
    remat: Any = False

    @nn.compact
    def __call__(self, images, train: bool = False,
                 resize_as_input: bool = False):
        x = images.astype(self.dtype)
        _, _, _, res5 = ResnetBackbone(
            RESNET_DEPTHS[self.depth], dtype=self.dtype,
            bn_momentum=self.bn_momentum, remat=self.remat,
            name="resnet_backbone")(x, train)

        if self.head == "aspp":
            emb = ASPP(self.embedding_dim, use_bn=False, use_relu=False,
                       dtype=self.dtype, name="aspp")(res5, train)
        elif self.head == "pspp":
            h = PSPP(512, dtype=self.dtype, name="pspp")(res5, train)
            emb = nn.Conv(self.embedding_dim, (1, 1), use_bias=True,
                          kernel_init=torch_conv_init, dtype=self.dtype,
                          name="pspp_proj")(h)
        else:
            raise ValueError(f"unknown head {self.head}")

        emb = emb.astype(jnp.float32)
        b, h, w, _ = emb.shape
        emb = resize_bilinear(emb, (2 * h, 2 * w))
        if resize_as_input:
            emb = resize_bilinear(emb, (images.shape[1], images.shape[2]))

        size = (emb.shape[1], emb.shape[2])
        local_feats = local_model.location_color_features(
            images.astype(jnp.float32), size,
            use_color=self.use_color, use_location=True,
            norm_color=self.norm_color, smooth_ksize=self.smooth_ksize)
        return emb, local_feats


class ClassifierHead(nn.Module):
    """conv3x3(no bias) -> BN -> ReLU -> Dropout -> conv1x1 logits.

    Operates on L2-normalized embeddings (callers normalize). The SPML
    joint head uses dropout .75 (segsort_softmax.py:32), the standalone
    stage-2 classifier .65 (softmax_classifier.py:24).
    """
    num_classes: int
    hidden_dim: int
    dropout_rate: float = 0.75
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embeddings, train: bool = False):
        x = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=torch_conv_init,
                    dtype=self.dtype, name="conv1")(embeddings)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="dropout")(x)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                    kernel_init=torch_conv_init, name="conv2")(x)
        return x.astype(jnp.float32)


def host_init(model: nn.Module, rng, sample, train: bool = False,
              **kwargs):
    """`model.init` on the host CPU backend, under jit.

    Eager `.init` dispatches the whole forward op-by-op; on a tunneled
    TPU backend that costs ~200 s for R101 at 512^2 (measured,
    STARTUP_PROBE.json) and was ~95% of every inference stage's
    startup. Under jit XLA dead-code-eliminates the discarded forward,
    and the CPU backend has no tunnel round-trips, so the same init
    runs in ~1 s. Parameter/batch-stat values depend only on the param
    shapes (per-leaf RNG draws), never on the sample's spatial size
    (bitwise), and match eager init to 1 ulp (jit fuses the
    RNG->normal transform, rounding a few conv kernels differently by
    <=6e-8) — both locked by tests/test_host_init.py. Callers pass a
    small sample (any H,W the heads accept: >= 48 at stride 8 for
    PSPP's 6-bin pool, divisible by 32). Returns numpy leaves
    (uncommitted), so downstream device_put / jit inputs place them on
    whatever device the consumer uses.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            functools.partial(model.init, train=train, **kwargs))(
                jax.device_put(rng, cpu),
                jax.device_put(np.asarray(sample), cpu))
    return jax.tree.map(np.asarray, variables)


# smallest spatial sample every head accepts (see host_init docstring);
# param values are spatial-size independent so eval/init call sites use
# this instead of the full crop.
INIT_SAMPLE_HW = (96, 96)


def build_embedding_model(backbone_types: str, embedding_dim: int,
                          dtype=jnp.float32,
                          bn_momentum: float = 1.0 - 3e-4,
                          remat: bool = False) -> EmbeddingModel:
    """Factory matching the reference's config.network.backbone_types
    strings (train.py:83-88)."""
    table = {
        "panoptic_deeplab_101": dict(depth=101, head="aspp"),
        "panoptic_deeplab_50": dict(depth=50, head="aspp"),
        "panoptic_deeplab_10": dict(depth=10, head="aspp"),  # debug/tests
        "panoptic_pspnet_101": dict(depth=101, head="pspp"),
        "panoptic_pspnet_50": dict(depth=50, head="pspp"),
        "panoptic_pspnet_101_densepose": dict(
            depth=101, head="pspp", use_color=True, norm_color=True,
            smooth_ksize=5),
        # debug/tests: tiny pspnet densepose variant (same head + color
        # LFN wiring as the 101, depth-10 backbone) for CPU smoke runs
        "panoptic_pspnet_10_densepose": dict(
            depth=10, head="pspp", use_color=True, norm_color=True,
            smooth_ksize=5),
    }
    if backbone_types not in table:
        raise ValueError(f"Not support {backbone_types}")
    return EmbeddingModel(embedding_dim=embedding_dim, dtype=dtype,
                          bn_momentum=bn_momentum, remat=remat,
                          **table[backbone_types])
