"""Tune the fused joint-loss kernel's (BLOCK_N, BLOCK_P) on the real TPU.

Times forward and forward+backward of fused_joint_losses at flagship
scale (batch 8: N=131072 pixels, P=6144 prototypes, D=64) for several
tile shapes. All timed jits return SCALARS — on the tunneled axon
backend, block_until_ready on large device arrays returns before the
computation finishes, so scalar-reduced outputs are the only reliable
timing signal (measured: R101 fwd "0.44 ms" with array outputs vs
31.5 ms with a scalar output).
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from spml_tpu.ops import common
    from spml_tpu.ops.pallas import segsort_loss as sl

    B, N_per, D, P_per = 8, 16384, 64, 256
    N = B * N_per
    P = 3 * B * P_per  # current + memory bank 2
    rng = np.random.RandomState(0)
    emb = common.normalize_embedding(
        jnp.asarray(rng.randn(N, D), jnp.float32))
    protos = common.normalize_embedding(
        jnp.asarray(rng.randn(P, D), jnp.float32))
    pix_sem = jnp.asarray(rng.randint(0, 21, (N,)), jnp.int32)
    proto_sem = jnp.asarray(rng.randint(0, 21, (P,)), jnp.int32)
    pix_tag = jnp.asarray(rng.rand(N, 20) > 0.8, jnp.int32)
    proto_tag = jnp.asarray(rng.rand(P, 20) > 0.8, jnp.int32)
    own = jnp.asarray(rng.randint(0, P, (N,)), jnp.int32)
    pix_mask = jnp.ones((N,), bool)
    proto_mask = jnp.ones((P,), bool)

    def timeit(fn, *args, iters=10, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1000

    results = []
    for bn, bp in [(512, 1024), (256, 1024), (512, 2048)]:
        sl.BLOCK_N, sl.BLOCK_P = bn, bp

        @jax.jit
        def loss_fwd(e, p):
            a, o = sl.fused_joint_losses(
                e, pix_sem, own, pix_tag, p, proto_sem, proto_tag,
                6.0, 12.0, pix_mask, pix_mask, proto_mask,
                reduction="none")
            return jnp.sum(a) + jnp.sum(o)

        @jax.jit
        def loss_fwdbwd(e, p):
            de, dp = jax.grad(lambda ee, pp: loss_fwd(ee, pp),
                              argnums=(0, 1))(e, p)
            return jnp.sum(de * de) + jnp.sum(dp * dp)

        try:
            t_fwd = timeit(loss_fwd, emb, protos)
            t_bwd = timeit(loss_fwdbwd, emb, protos)
            r = {"BN": bn, "BP": bp, "fwd_ms": round(t_fwd, 2),
                 "fwd_bwd_ms": round(t_bwd, 2)}
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            r = {"BN": bn, "BP": bp, "error": str(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

    ok = [r for r in results if "fwd_bwd_ms" in r]
    if ok:
        print("BEST:", json.dumps(min(ok, key=lambda r: r["fwd_bwd_ms"])))


if __name__ == "__main__":
    main()
