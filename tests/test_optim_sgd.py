"""SGD parity vs the reference (lib/nn/optimizer.py:18-104) under a
TIME-VARYING schedule: the reference folds group_lr*lr_t into the
momentum buffer each step (buf = m*buf + lr_t*mult*(g + wd*p); p -= buf)
rather than scaling the buffer by the current LR."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spml_tpu.train import optim

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference checkout not available", allow_module_level=True)


def _params():
    rng = np.random.RandomState(3)
    return {
        "resnet_backbone": {"res4": {"conv": {
            "kernel": rng.randn(4, 5).astype(np.float32),
            "bias": rng.randn(5).astype(np.float32)}}},
        "pspp": {"kernel": rng.randn(5, 3).astype(np.float32),
                 "bias": rng.randn(3).astype(np.float32)},
    }


def _grads(seed):
    rng = np.random.RandomState(100 + seed)
    return jax.tree.map(
        lambda p: rng.randn(*p.shape).astype(np.float32), _params())


def test_sgd_matches_reference_with_varying_lr():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from lib.nn.optimizer import SGD

    wd, mom = 5e-4, 0.9
    # strongly varying schedule so buffer-LR folding actually matters
    lrs = [3e-3, 1e-3, 3e-3, 3e-4, 2e-3, 1e-4, 3e-3, 5e-4]

    params = _params()
    t_k = torch.nn.Parameter(torch.from_numpy(
        params["resnet_backbone"]["res4"]["conv"]["kernel"].copy()))
    t_b = torch.nn.Parameter(torch.from_numpy(
        params["resnet_backbone"]["res4"]["conv"]["bias"].copy()))
    t_hk = torch.nn.Parameter(torch.from_numpy(
        params["pspp"]["kernel"].copy()))
    t_hb = torch.nn.Parameter(torch.from_numpy(
        params["pspp"]["bias"].copy()))
    opt = SGD([
        {"params": [t_k], "lr": 1.0},
        {"params": [t_b], "lr": 2.0, "weight_decay": 0.0},
        {"params": [t_hk], "lr": 10.0},
        {"params": [t_hb], "lr": 20.0, "weight_decay": 0.0},
    ], lr=1.0, momentum=mom, weight_decay=wd)

    for i, lr in enumerate(lrs):
        g = _grads(i)
        t_k.grad = torch.from_numpy(
            g["resnet_backbone"]["res4"]["conv"]["kernel"].copy())
        t_b.grad = torch.from_numpy(
            g["resnet_backbone"]["res4"]["conv"]["bias"].copy())
        t_hk.grad = torch.from_numpy(g["pspp"]["kernel"].copy())
        t_hb.grad = torch.from_numpy(g["pspp"]["bias"].copy())
        opt.step(lr)

    class TrainCfg:
        weight_decay = wd
        momentum = mom

    lr_table = jnp.asarray(lrs, jnp.float32)
    jp = jax.tree.map(jnp.asarray, _params())
    tx = optim.make_optimizer(
        jp, TrainCfg,
        schedule=lambda step: lr_table[jnp.asarray(step, jnp.int32)])
    st = tx.init(jp)
    for i in range(len(lrs)):
        upd, st = tx.update(_grads(i), st, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, upd)

    np.testing.assert_allclose(
        np.asarray(jp["resnet_backbone"]["res4"]["conv"]["kernel"]),
        t_k.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jp["resnet_backbone"]["res4"]["conv"]["bias"]),
        t_b.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jp["pspp"]["kernel"]),
                               t_hk.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jp["pspp"]["bias"]),
                               t_hb.detach().numpy(), rtol=1e-5, atol=1e-7)
