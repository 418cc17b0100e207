"""Spatial pyramid heads (ASPP / PSPP) in flax/NHWC.

Behavioral reference: spml/models/heads/spp.py in twke18/SPML
(ASPP:8 — four 3x3 convs at dilations 6/12/18/24, outputs SUMMED not
concatenated; PSPP:46 — adaptive-avg pools 1/2/3/6 + 1x1 conv each,
bilinear-resized back, concatenated with input, fused by a 3x3 conv).
When used as an SPML embedding head, ASPP runs with bn=False, relu=False
(resnet_deeplab.py:37-40), i.e. biased convs, raw sum.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch default Conv2d init (kaiming_uniform a=sqrt(5)) == uniform bound
# 1/sqrt(fan_in) == variance_scaling(1/3, fan_in, uniform)
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                   "uniform")


def _conv(features, kernel, dilation=1, use_bias=True, name=None,
          dtype=jnp.float32):
    # dtype is the COMPUTE dtype (params stay f32, as in the backbone's
    # convs — resnet.py) so the head's convs ride the MXU at bf16 rate
    # under tpu.compute_dtype=bfloat16 instead of being silently promoted
    # to f32 (measured 9.7-18.9% MFU f32 vs ~2x at bf16; trace profile in
    # PERF.md)
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(dilation, dilation),
                   use_bias=use_bias, kernel_init=torch_conv_init,
                   dtype=dtype, name=name)


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics: bin i spans
    [floor(i*H/s), ceil((i+1)*H/s)). Static small `out_size` -> unrolled."""
    def pool_axis(v, axis, s):
        n = v.shape[axis]
        chunks = []
        for i in range(s):
            lo = (i * n) // s
            hi = -(-((i + 1) * n) // s)
            sl = jax.lax.slice_in_dim(v, lo, hi, axis=axis)
            chunks.append(jnp.mean(sl, axis=axis, keepdims=True))
        return jnp.concatenate(chunks, axis=axis)

    x = pool_axis(x, 1, out_size)
    x = pool_axis(x, 2, out_size)
    return x


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(bilinear, align_corners=False) equivalent
    (half-pixel centers). antialias=False: torch never anti-aliases, and
    jax.image.resize would when downscaling (e.g. PSPP's 6x6 pyramid level
    resized back onto a 5x7 feature map)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="linear",
                            antialias=False)


class ASPP(nn.Module):
    out_channels: int
    use_bn: bool = False
    use_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, d in enumerate((6, 12, 18, 24)):
            h = _conv(self.out_channels, 3, dilation=d,
                      use_bias=not self.use_bn, dtype=self.dtype,
                      name=f"aspp_{i+1}")(x)
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=1.0 - 3e-4, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn_{i+1}")(h)
            if self.use_relu:
                h = nn.relu(h)
            outs.append(h)
        return sum(outs)


class PSPP(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = (x.shape[1], x.shape[2])

        def branch(v, pool_size, name):
            v = adaptive_avg_pool(v, pool_size)
            v = _conv(self.out_channels, 1, use_bias=False,
                      dtype=self.dtype, name=f"{name}_conv")(v)
            v = nn.BatchNorm(use_running_average=not train,
                             momentum=1.0 - 3e-4, epsilon=1e-5,
                             dtype=self.dtype, name=f"{name}_bn")(v)
            v = nn.relu(v)
            return resize_bilinear(v, size)

        xs = [x]
        for i, s in enumerate((1, 2, 3, 6)):
            xs.append(branch(x, s, f"pspp_{i+1}"))
        out = jnp.concatenate(xs, axis=-1)
        out = _conv(self.out_channels, 3, use_bias=False,
                    dtype=self.dtype, name="fuse_conv")(out)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=1.0 - 3e-4, epsilon=1e-5,
                           dtype=self.dtype, name="fuse_bn")(out)
        return nn.relu(out)
