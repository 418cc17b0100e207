"""Split the train step's ~12 ms 'optimizer + memory push + dispatch
tail' (PERF.md step breakdown) into its parts, chained-measured on the
real chip (see PERF.md measurement methodology: only computations whose
iterations depend on each other time correctly over the tunnel).

Variants, all jitted with donated carries and threaded through 10
iterations:
  A  value_and_grad only (params' = params - 1e-12 * grads to chain)
  B  A + the real optax update + apply_updates
  C  the full train step (state carried/donated, as bench.py)

B - A isolates the optimizer; C - B isolates memory push + metrics +
the rest of the step's tail.

Usage: python pyscripts/misc/tail_profile.py [--batch 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from spml_tpu.cli import enable_compilation_cache
    from spml_tpu.config import load_config
    from spml_tpu.train import optim, step as step_lib

    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_101",
                    "embedding_dim": 64,
                    "kmeans_num_clusters": [6, 6],
                    "kmeans_iterations": 10},
        "dataset": {"num_classes": 21},
        "train": {"batch_size": args.batch,
                  "crop_size": [args.crop, args.crop],
                  "memory_bank_size": 2, "max_iteration": 30000,
                  "warmup_iteration": 100, "base_lr": 3e-3,
                  "sem_ann_concentration": 6.0,
                  "sem_occ_concentration": 12.0,
                  "img_sim_concentration": 16.0,
                  "sem_ann_loss_weight": 1.0,
                  "sem_occ_loss_weight": 0.5,
                  "img_sim_loss_weight": 0.1},
        "tpu": {"segment_capacity": 256, "compute_dtype": "bfloat16",
                "use_fused_loss": True},
    })
    enable_compilation_cache(cfg)

    import pyscripts.misc.lockstep_parity as lp
    lp.SCEN.update(batch=args.batch, crop=args.crop, num_classes=21,
                   ignore=255)
    b = lp.make_batches(1)[0]
    data = {k: jnp.asarray(v) for k, v in b.items()}

    state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                jnp.zeros((args.batch, args.crop,
                                           args.crop, 3)))
    train_step = step_lib.make_train_step(cfg)
    fwd = train_step.forward_and_losses
    data_mem = dict(data, memory=state.memory)
    rng = jax.random.PRNGKey(1)

    schedule = optim.make_schedule(cfg.train)
    tx = optim.make_optimizer(state.params, cfg.train, schedule)
    opt_state = tx.init(state.params)

    @jax.jit
    def step_a(params, stats):
        (_, (_, new_stats, _)), grads = jax.value_and_grad(
            fwd, has_aux=True)(params, stats, data_mem, rng)
        new_params = jax.tree.map(lambda p, g: p - 1e-12 * g,
                                  params, grads)
        return new_params, new_stats

    @jax.jit
    def step_b(params, stats, opt_state):
        (_, (_, new_stats, _)), grads = jax.value_and_grad(
            fwd, has_aux=True)(params, stats, data_mem, rng)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt

    step_c = jax.jit(train_step, donate_argnums=(0,))

    def chain(fn, carry, iters):
        for _ in range(2):
            carry = fn(*carry)
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(*carry)
        jax.block_until_ready(carry)
        return (time.perf_counter() - t0) / iters * 1000

    a = chain(step_a, (state.params, state.batch_stats), args.iters)
    print(f"A fwd+bwd:            {a:.1f} ms", flush=True)
    bt = chain(step_b, (state.params, state.batch_stats, opt_state),
               args.iters)
    print(f"B + optimizer:        {bt:.1f} ms (optimizer {bt - a:.1f})",
          flush=True)

    def c_fn(st):
        st2, _ = step_c(st, dict(data))
        return (st2,)

    ct = chain(c_fn, (state,), args.iters)
    print(f"C full step:          {ct:.1f} ms (memory/metrics/tail "
          f"{ct - bt:.1f})", flush=True)
    print(json.dumps({"fwd_bwd_ms": round(a, 1),
                      "with_optimizer_ms": round(bt, 1),
                      "full_step_ms": round(ct, 1)}))


if __name__ == "__main__":
    main()
