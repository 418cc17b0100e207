"""Measure valid-prototype compaction: fused joint loss fwd+bwd time vs
prototype fill fraction on the real TPU.

The prototype array is fixed-capacity (256 slots/image x batch x
(1 + memory bank)); real scribble/tag data fills ~25-40% of it. With
compaction (sort valid-first + scalar-prefetch tile skip in the Pallas
kernels, spml_tpu/ops/pallas/segsort_loss.py) the sweep cost should
scale with the VALID count, not the capacity. This script times the
joint loss fwd+bwd at several fill fractions, compact on vs off.

Timing is CHAINED (each iteration's input depends on the previous
output scalar) — on the tunneled axon backend un-chained loops report
impossible numbers (see CLAUDE.md).
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
    proto_sem_np = rng.randint(0, 21, (P,)).astype(np.int32)
    pix_tag = jnp.asarray(rng.rand(N, 20) > 0.8, jnp.int32)
    proto_tag = jnp.asarray(rng.rand(P, 20) > 0.8, jnp.int32)
    pix_mask = jnp.ones((N,), bool)

    results = []
    for fill in (1.0, 0.5, 0.3, 0.15):
        # scattered validity at the requested fill; pixels' own
        # prototypes restricted to the valid set (as in real training)
        valid_np = rng.rand(P) < fill
        valid_np[0] = True
        valid_idx = np.nonzero(valid_np)[0]
        own = jnp.asarray(
            valid_idx[rng.randint(0, len(valid_idx), N)].astype(np.int32))
        proto_mask = jnp.asarray(valid_np)
        proto_sem = jnp.asarray(
            np.where(valid_np, proto_sem_np, -1).astype(np.int32))

        for compact in (False, True):
            def loss_scalar(e, p, compact=compact, own=own,
                            proto_sem=proto_sem, proto_mask=proto_mask):
                a, o = sl.fused_joint_losses(
                    e, pix_sem, own, pix_tag, p, proto_sem, proto_tag,
                    6.0, 12.0, pix_mask, pix_mask, proto_mask,
                    reduction="none", compact=compact)
                return jnp.sum(a) + 0.5 * jnp.sum(o)

            def step(carry, e, p):
                # chain: perturb inputs by the carry so iteration i+1
                # cannot start before iteration i finishes
                e = e + carry * 1e-30
                val, (de, dp) = jax.value_and_grad(
                    loss_scalar, argnums=(0, 1))(e, p)
                return (val + jnp.sum(de * de) + jnp.sum(dp * dp)) * 1e-20

            step_j = jax.jit(step)
            carry = jnp.zeros(())
            carry = step_j(carry, emb, protos)  # compile
            float(carry)
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                carry = step_j(carry, emb, protos)
            final = float(carry)
            dt = (time.perf_counter() - t0) / iters * 1000
            r = {"fill": fill, "compact": compact,
                 "fwd_bwd_ms": round(dt, 2),
                 "finite": bool(np.isfinite(final))}
            results.append(r)
            print(json.dumps(r), flush=True)

    out = os.path.join(ROOT, "COMPACTION_BENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
