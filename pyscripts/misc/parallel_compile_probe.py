"""Probe: do tunnel XLA compiles parallelize across threads?

engine.warmup pays one sequential multi-minute tunnel compile per
(bucket, program-kind). If the compile RPCs parallelize server-side,
running them from a thread pool would cut warmup wall time by ~the
thread count. This measures 2 sequential vs 2 concurrent compiles of
distinct-shape conv programs (uncached shapes each run).

Usage: python pyscripts/misc/parallel_compile_probe.py
"""

import concurrent.futures
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    # distinct odd shapes so neither persistent nor in-process caches hit
    seed = int.from_bytes(os.urandom(2), "little")

    def make(shape_h):
        def f(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.tanh(y) * jnp.sum(x)

        x = jnp.zeros((2, shape_h, 128, 64), jnp.bfloat16)
        w = jnp.zeros((3, 3, 64, 64), jnp.bfloat16)
        return jax.jit(f).lower(x, w)

    lowered = [make(97 + seed % 7 + 2 * i) for i in range(4)]

    t0 = time.time()
    for lo in lowered[:2]:
        lo.compile()
    seq = time.time() - t0

    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        list(pool.map(lambda lo: lo.compile(), lowered[2:]))
    par = time.time() - t0

    print(f"sequential 2 compiles: {seq:.1f}s; concurrent 2: {par:.1f}s "
          f"-> {'PARALLEL' if par < 0.75 * seq else 'SERIALIZED'}")


if __name__ == "__main__":
    main()
