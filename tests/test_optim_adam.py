"""Adam optimizer parity vs the reference implementation
(lib/nn/optimizer.py:107-179): eps added to sqrt(uncorrected nu), bias
correction folded into the step size, L2 wd before the moments, per-group
LR multipliers {1,2,10,20}, schedule LR passed per step."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spml_tpu.train import optim

REFERENCE = "/root/reference"


def _params():
    rng = np.random.RandomState(0)
    return {
        "resnet_backbone": {"res3": {"conv": {
            "kernel": rng.randn(3, 4).astype(np.float32),
            "bias": rng.randn(4).astype(np.float32)}}},
        "aspp": {"kernel": rng.randn(4, 2).astype(np.float32),
                 "bias": rng.randn(2).astype(np.float32)},
    }


def _grads(seed):
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda p: rng.randn(*p.shape).astype(np.float32), _params())


def _run_ours(n_steps, lrs, wd=5e-4):
    class TrainCfg:
        weight_decay = wd
        momentum = 0.9

    params = jax.tree.map(jnp.asarray, _params())
    # schedule reads the step counter optax keeps (0-based at first use)
    lr_table = jnp.asarray(lrs, jnp.float32)
    tx = optim.make_adam_optimizer(
        params, TrainCfg,
        schedule=lambda step: lr_table[jnp.asarray(step, jnp.int32)])
    state = tx.init(params)
    for i in range(n_steps):
        updates, state = tx.update(_grads(i), state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return jax.tree.map(np.asarray, params)


def _run_reference_formula(n_steps, lrs, wd=5e-4, b1=0.9, b2=0.999,
                           eps=1e-8):
    """Direct numpy transcription of the reference math
    (optimizer.py:147-179)."""
    params = _params()
    mults = {
        ("resnet_backbone", "res3", "conv", "kernel"): (1.0, wd),
        ("resnet_backbone", "res3", "conv", "bias"): (2.0, 0.0),
        ("aspp", "kernel"): (10.0, wd),
        ("aspp", "bias"): (20.0, 0.0),
    }

    flat = {k: v for k, v in [
        (("resnet_backbone", "res3", "conv", "kernel"),
         params["resnet_backbone"]["res3"]["conv"]["kernel"].copy()),
        (("resnet_backbone", "res3", "conv", "bias"),
         params["resnet_backbone"]["res3"]["conv"]["bias"].copy()),
        (("aspp", "kernel"), params["aspp"]["kernel"].copy()),
        (("aspp", "bias"), params["aspp"]["bias"].copy()),
    ]}
    mu = {k: np.zeros_like(v) for k, v in flat.items()}
    nu = {k: np.zeros_like(v) for k, v in flat.items()}
    for i in range(n_steps):
        grads = _grads(i)
        gflat = {
            ("resnet_backbone", "res3", "conv", "kernel"):
                grads["resnet_backbone"]["res3"]["conv"]["kernel"],
            ("resnet_backbone", "res3", "conv", "bias"):
                grads["resnet_backbone"]["res3"]["conv"]["bias"],
            ("aspp", "kernel"): grads["aspp"]["kernel"],
            ("aspp", "bias"): grads["aspp"]["bias"],
        }
        t = i + 1
        for k in flat:
            group_mult, group_wd = mults[k]
            g = gflat[k] + group_wd * flat[k]
            mu[k] = b1 * mu[k] + (1 - b1) * g
            nu[k] = b2 * nu[k] + (1 - b2) * g * g
            denom = np.sqrt(nu[k]) + eps
            step_size = (lrs[i] * group_mult
                         * np.sqrt(1 - b2 ** t) / (1 - b1 ** t))
            flat[k] = flat[k] - step_size * mu[k] / denom
    return flat


def test_adam_matches_reference_formula():
    lrs = [3e-3 * (1 - i / 10) ** 0.9 for i in range(6)]
    ours = _run_ours(6, lrs)
    ref = _run_reference_formula(6, lrs)
    np.testing.assert_allclose(
        ours["resnet_backbone"]["res3"]["conv"]["kernel"],
        ref[("resnet_backbone", "res3", "conv", "kernel")],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        ours["resnet_backbone"]["res3"]["conv"]["bias"],
        ref[("resnet_backbone", "res3", "conv", "bias")],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["aspp"]["kernel"],
                               ref[("aspp", "kernel")],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["aspp"]["bias"],
                               ref[("aspp", "bias")],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_adam_matches_reference_torch():
    import torch
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from lib.nn.optimizer import Adam

    wd = 5e-4
    params = _params()
    t_kernel = torch.nn.Parameter(torch.from_numpy(
        params["resnet_backbone"]["res3"]["conv"]["kernel"].copy()))
    t_bias = torch.nn.Parameter(torch.from_numpy(
        params["resnet_backbone"]["res3"]["conv"]["bias"].copy()))
    t_hk = torch.nn.Parameter(torch.from_numpy(
        params["aspp"]["kernel"].copy()))
    t_hb = torch.nn.Parameter(torch.from_numpy(
        params["aspp"]["bias"].copy()))
    opt = Adam([
        {"params": [t_kernel], "lr": 1.0, "weight_decay": wd},
        {"params": [t_bias], "lr": 2.0, "weight_decay": 0.0},
        {"params": [t_hk], "lr": 10.0, "weight_decay": wd},
        {"params": [t_hb], "lr": 20.0, "weight_decay": 0.0},
    ], lr=1.0, weight_decay=wd)

    lrs = [3e-3 * (1 - i / 10) ** 0.9 for i in range(6)]
    for i in range(6):
        grads = _grads(i)
        t_kernel.grad = torch.from_numpy(
            grads["resnet_backbone"]["res3"]["conv"]["kernel"].copy())
        t_bias.grad = torch.from_numpy(
            grads["resnet_backbone"]["res3"]["conv"]["bias"].copy())
        t_hk.grad = torch.from_numpy(grads["aspp"]["kernel"].copy())
        t_hb.grad = torch.from_numpy(grads["aspp"]["bias"].copy())
        opt.step(lrs[i])

    ours = _run_ours(6, lrs, wd=wd)
    np.testing.assert_allclose(
        ours["resnet_backbone"]["res3"]["conv"]["kernel"],
        t_kernel.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        ours["resnet_backbone"]["res3"]["conv"]["bias"],
        t_bias.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["aspp"]["kernel"],
                               t_hk.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["aspp"]["bias"],
                               t_hb.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adam_wired_into_train_step_end_to_end():
    """train.optimizer='adam' reaches init_state/train_step: the opt
    state carries Adam moments and a real step updates the params."""
    import optax

    from spml_tpu.config import load_config
    from spml_tpu.train import step as step_lib

    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_num_clusters": [2, 2],
                    "kmeans_iterations": 3},
        "dataset": {"num_classes": 4},
        "train": {"batch_size": 2, "crop_size": [32, 32],
                  "memory_bank_size": 1, "max_iteration": 100,
                  "warmup_iteration": 10, "optimizer": "adam"},
        "tpu": {"segment_capacity": 32, "compute_dtype": "float32"},
    })
    rng = np.random.RandomState(3)
    img = jnp.zeros((2, 32, 32, 3))
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    adam_states = [s for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda x: isinstance(
            x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states, "opt_state does not carry Adam moments"

    step = jax.jit(step_lib.make_train_step(cfg))
    batch = {
        "image": jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
        "semantic_label": jnp.asarray(
            rng.randint(0, 5, (2, 32, 32)), jnp.int32),
        "instance_label": jnp.asarray(
            rng.randint(0, 4, (2, 32, 32)), jnp.int32),
        "semantic_tag": jnp.asarray(rng.rand(2, 256) > 0.6, jnp.int32),
    }
    p0 = jax.device_get(state.params)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0),
                        jax.tree.leaves(jax.device_get(state.params))))
    assert moved


def test_bad_optimizer_name_rejected():
    class TrainCfg:
        weight_decay = 5e-4
        momentum = 0.9
        optimizer = "adamw"
        lr_policy = "poly"
        base_lr = 3e-3
        max_iteration = 10
        warmup_iteration = 0

    with pytest.raises(ValueError):
        optim.build_optimizer(jax.tree.map(jnp.asarray, _params()),
                              TrainCfg)
