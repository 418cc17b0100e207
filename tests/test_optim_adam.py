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
