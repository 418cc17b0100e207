"""Probe: hand-written Pallas dilated 3x3 conv vs XLA's native emitter.

Motivation (PERF.md "Dilated-conv reformulation probes"): res4's 3x3
d=2 256-ch convs run at ~26% of bf16 peak under XLA's emitter and make
up 23 of the 33 backbone bottlenecks; graph-level reformulations
(shifted einsum, im2col, space-to-batch) all lose to the emitter. This
tries below the graph: one Pallas program per batch item — the padded
image slab (2.65 MB), the full 3x3xCxO weight (1.2 MB) and an f32
accumulator live in VMEM, and the 9 taps are 9 static shifted loads
feeding [HW, C] x [C, O] MXU matmuls. No HBM traffic between taps.

Chained-carry timing (CLAUDE.md timing trap). Prints ms + TF/s.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def native_conv(x, w, d):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _kernel(xp_ref, w_ref, o_ref, acc_ref, *, d, H, W, C, O):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for i in range(3):
        for j in range(3):
            tap = xp_ref[0, i * d:i * d + H, j * d:j * d + W, :]
            tap = tap.reshape(H * W, C)
            acc_ref[:] += jnp.dot(tap, w_ref[i, j],
                                  preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[:].reshape(H, W, O).astype(o_ref.dtype)


def pallas_conv(x, w, d):
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    return pl.pallas_call(
        functools.partial(_kernel, d=d, H=H, W=W, C=C, O=O),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2 * d, W + 2 * d, C),
                         lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, O), lambda b: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, O), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((H * W, O), jnp.float32)],
    )(xp, w)


ITERS = 50


def bench(fn, x, w, d):
    f = functools.partial(fn, d=d)

    def chain(x, w):
        def body(c, _):
            return f(c, w) * jnp.bfloat16(0.01), 0.
        c, _ = lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    cj = jax.jit(chain)
    float(cj(x, w))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(cj(x, w))
        best = min(best, time.time() - t0)
    return best / ITERS * 1e3


if __name__ == "__main__":
    shapes = [("res4 d2 256ch", 8, 64, 64, 256, 256, 2),
              ("res5 d4 512ch", 8, 64, 64, 512, 512, 4)]
    for name, B, H, W, C, O, d in shapes:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, C, O), jnp.bfloat16) * 0.05
        a = np.asarray(native_conv(x, w, d), np.float32)
        b = np.asarray(pallas_conv(x, w, d), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        tn = bench(native_conv, x, w, d)
        tp = bench(pallas_conv, x, w, d)
        tf = 2 * B * H * W * C * O * 9 / 1e12
        print(f"{name}: native {tn:.3f} ms ({tf/tn*1e3:.1f} TF/s)  "
              f"pallas {tp:.3f} ms ({tf/tp*1e3:.1f} TF/s)  "
              f"relerr {err:.2e}", flush=True)
