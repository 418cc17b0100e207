"""ResNet backbone (deeplab-style 3x3x3 stem, dilated) in flax/NHWC.

Behavioral reference: spml/models/backbones/resnet.py in twke18/SPML
(Bottleneck:11, conv1 stem:66, ResnetBackbone:113). Key fidelity points:
* 3-conv stem (3->64->64->128) stride 2 + maxpool 3x3/2 (replaces 7x7);
* BatchNorm momentum 3e-4 (torch) == 0.9997 (flax convention), eps 1e-5;
* stride on the 3x3 conv of the first block of each stage;
* dilation mapping (resnet.py:154-159): stage dilation 1|2 -> first block
  dilation 1, stage dilation 4 -> first block dilation 2; remaining
  blocks use the full stage dilation;
* r101 = [3,4,23,3], strides [1,2,1,1], dilations [1,1,2,4] -> output
  stride 8.

TPU re-design: NHWC layout (TPU-native), explicit torch-style padding so
feature alignment matches the reference exactly, bf16 compute with fp32
params/statistics. Cross-replica BatchNorm comes for free under GSPMD:
batch statistics are computed over the global (sharded) batch axis and
XLA inserts the ICI all-reduce — this replaces the reference's entire
lib/nn/sync_batchnorm machinery.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 1.0 - 3e-4  # torch momentum 3e-4
BN_EPS = 1e-5

# torch init: normal(0, sqrt(2 / (k*k*out_ch))) == variance_scaling fan_out
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    use_bn: bool = True
    relu: bool = False
    dtype: Any = jnp.float32
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=not self.use_bn,
                    kernel_init=conv_init,
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=BN_EPS,
                             dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation) -> 1x1(x4) with projection shortcut."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        kw = dict(dtype=self.dtype, bn_momentum=self.bn_momentum)
        out = ConvBN(self.planes, 1, relu=True, name="conv1",
                     **kw)(x, train)
        out = ConvBN(self.planes, 3, stride=self.stride,
                     dilation=self.dilation, relu=True, name="conv2",
                     **kw)(out, train)
        out = ConvBN(self.planes * 4, 1, name="conv3", **kw)(out, train)
        if self.has_downsample:
            residual = ConvBN(self.planes * 4, 1, stride=self.stride,
                              name="downsample", **kw)(x, train)
        return nn.relu(out + residual)


class Stem(nn.Module):
    """3x 3x3 conv stem + maxpool (reference resnet.py:66-110)."""
    dtype: Any = jnp.float32
    bn_momentum: float = BN_MOMENTUM

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, bn_momentum=self.bn_momentum)
        x = ConvBN(64, 3, stride=2, relu=True, name="conv1_1",
                   **kw)(x, train)
        x = ConvBN(64, 3, relu=True, name="conv1_2", **kw)(x, train)
        x = ConvBN(128, 3, relu=True, name="conv1_3", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        return x


class Stage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_momentum: float = BN_MOMENTUM
    # per-block rematerialization: save only block boundaries, recompute
    # the 3 intra-block conv/BN/relu activations during backward. Trades
    # HBM reads for MXU recompute — the train step is bandwidth-bound
    # (TRACE_PROFILE.json: 79% of HBM peak at 42% MFU), and it is also
    # the memory lever for larger batch/crop.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        # reference resnet.py:154-159 — first block gets reduced dilation
        first_dil = 1 if self.dilation in (1, 2) else 2
        in_ch = x.shape[-1]
        kw = dict(dtype=self.dtype, bn_momentum=self.bn_momentum)
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        x = block_cls(self.planes, self.stride, first_dil,
                      has_downsample=(self.stride != 1
                                      or in_ch != self.planes * 4),
                      name="block0", **kw)(x, train)
        for i in range(1, self.blocks):
            x = block_cls(self.planes, 1, self.dilation,
                          name=f"block{i}", **kw)(x, train)
        return x


class ResnetBackbone(nn.Module):
    """Returns (res2, res3, res4, res5) feature maps, NHWC."""
    blocks: Sequence[int]
    strides: Sequence[int] = (1, 2, 1, 1)
    dilations: Sequence[int] = (1, 1, 2, 4)
    dtype: Any = jnp.float32
    bn_momentum: float = BN_MOMENTUM
    # bool (all stages) or a (res2, res3, res4, res5) tuple of bools:
    # selective remat targets only the bandwidth-heavy stages (res4's
    # 1024-ch activations are 67 MB each at batch 8 — PERF.md roofline)
    # without paying recompute for the cheap early stages.
    remat: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Stem(name="stem", dtype=self.dtype,
                 bn_momentum=self.bn_momentum)(x, train)
        rm = (tuple(self.remat) if isinstance(self.remat, (tuple, list))
              else (bool(self.remat),) * 4)
        kw = dict(dtype=self.dtype, bn_momentum=self.bn_momentum)
        res2 = Stage(64, self.blocks[0], self.strides[0],
                     self.dilations[0], name="res2", remat=rm[0],
                     **kw)(x, train)
        res3 = Stage(128, self.blocks[1], self.strides[1],
                     self.dilations[1], name="res3", remat=rm[1],
                     **kw)(res2, train)
        res4 = Stage(256, self.blocks[2], self.strides[2],
                     self.dilations[2], name="res4", remat=rm[2],
                     **kw)(res3, train)
        res5 = Stage(512, self.blocks[3], self.strides[3],
                     self.dilations[3], name="res5", remat=rm[3],
                     **kw)(res4, train)
        return res2, res3, res4, res5


RESNET_DEPTHS = {
    10: (1, 1, 1, 1),  # debug/test-only tiny variant
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}
