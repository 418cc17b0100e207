"""Probe: does space-to-batch beat XLA's native dilated conv on TPU?

res4 (23 blocks, dilation 2, 64x64x1024) and res5 (3 blocks, dilation
4) carry ~82% of the backbone FLOPs and measure ~52-57% MFU via XLA's
native conv_general_dilated. Space-to-batch rewrites a dilation-d 3x3
conv as a dense 3x3 conv over d^2 phase-shifted subgrids stacked on the
batch axis — if XLA's emitter doesn't already do this, the dense conv
may tile better on the MXU.

Chained measurement (see PERF.md methodology). Checks numerics match
before timing.

Usage: python pyscripts/misc/dilated_conv_probe.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from spml_tpu.cli import enable_compilation_cache
    from spml_tpu.config import load_config
    enable_compilation_cache(load_config())

    B, H, W, C = 8, 64, 64, 1024
    COUT = 256  # bottleneck conv2: 1024->256 at 3x3 dilated... use 256
    d = 2

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, COUT) * 0.01, jnp.bfloat16)

    def conv_native(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def conv_s2b(x):
        # pad so H, W divisible by d (64 already is), split phases
        xp = x.reshape(B, H // d, d, W // d, d, C)
        xp = xp.transpose(2, 4, 0, 1, 3, 5).reshape(
            d * d * B, H // d, W // d, C)
        y = jax.lax.conv_general_dilated(
            xp, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        y = y.reshape(d, d, B, H // d, W // d, COUT)
        y = y.transpose(2, 3, 0, 4, 1, 5).reshape(B, H, W, COUT)
        return y

    # numerics check (fp32 for comparison)
    a = np.asarray(conv_native(x0), np.float32)
    b = np.asarray(conv_s2b(x0), np.float32)
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    print(f"max rel err native vs s2b: {err:.2e}")
    assert err < 1e-2, "s2b mismatch"

    # chained timing: y feeds back via a cheap projection to x's shape
    proj = jnp.asarray(rng.randn(COUT, C) * 0.01, jnp.bfloat16)

    def chain(conv):
        @jax.jit
        def step(x):
            y = conv(x)
            return x + jnp.einsum("bhwc,cd->bhwd", y, proj) * 1e-6

        xx = x0
        for _ in range(3):
            xx = step(xx)
        jax.block_until_ready(xx)
        t0 = time.perf_counter()
        for _ in range(20):
            xx = step(xx)
        jax.block_until_ready(xx)
        return (time.perf_counter() - t0) / 20 * 1000

    tn = chain(conv_native)
    ts = chain(conv_s2b)
    flops = 2 * B * H * W * 9 * C * COUT
    print(f"native dilated: {tn:.2f} ms ({flops / tn / 1e9:.0f} TFLOP/s)")
    print(f"space-to-batch: {ts:.2f} ms ({flops / ts / 1e9:.0f} TFLOP/s)")
    print("note: chain adds a projection matmul "
          f"({2 * B * H * W * COUT * C / 1e9:.1f} GFLOP) to both")


if __name__ == "__main__":
    main()
