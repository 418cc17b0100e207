"""Loss-reduction semantics: per-device mean-of-means (the reference's
train.py:211-219) vs global masked pixel mean, and the deviation between
them on skewed valid-pixel counts.

The numbers this test asserts are recorded in PARITY.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spml_tpu.train import step as step_lib


def _grouped(values, mask, g):
    return step_lib._grouped_masked_mean(
        jnp.asarray(values), jnp.asarray(mask), g)


def test_grouped_mean_equals_reference_mean_of_means():
    rng = np.random.RandomState(0)
    # 8 devices x 100 pixels, skewed valid counts (2 .. 90)
    ll = rng.rand(8, 100).astype(np.float32)
    counts = [2, 5, 90, 50, 10, 70, 30, 100]
    mask = np.zeros((8, 100), bool)
    for i, c in enumerate(counts):
        mask[i, :c] = True

    got = float(_grouped(ll.reshape(-1), mask.reshape(-1), 8))
    want = np.mean([ll[i, :c].mean() for i, c in enumerate(counts)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_grouped_mean_skips_empty_groups():
    ll = np.ones((4, 10), np.float32) * np.arange(4)[:, None]
    mask = np.ones((4, 10), bool)
    mask[2] = False  # device with zero valid pixels contributes nothing
    got = float(_grouped(ll.reshape(-1), mask.reshape(-1), 4))
    np.testing.assert_allclose(got, (0 + 1 + 3) / 3, rtol=1e-6)


def test_single_group_is_global_mean():
    rng = np.random.RandomState(1)
    ll = rng.rand(800).astype(np.float32)
    mask = rng.rand(800) > 0.3
    got = float(_grouped(ll, mask, 1))
    np.testing.assert_allclose(got, ll[mask].mean(), rtol=1e-6)


def test_reduction_modes_deviate_only_when_skewed():
    """Quantify the global-mean vs per-device-mean gradient deviation on
    the real train step with an engineered skew: one device group's
    images are almost entirely ignore-labeled."""
    from spml_tpu.config import load_config

    def make_cfg(mode):
        return load_config(overrides={
            "dataset": {"num_classes": 4},
            "network": {"backbone_types": "panoptic_deeplab_10",
                        "embedding_dim": 8,
                        "kmeans_num_clusters": [2, 2],
                        "kmeans_iterations": 2},
            "train": {"batch_size": 1, "crop_size": [32, 32],
                      "memory_bank_size": 0,
                      # exclude wd/momentum so first-step updates are
                      # exactly -lr * group_mult * grad
                      "weight_decay": 0.0, "momentum": 0.0},
            # capacity 64 >> max segments: nothing overflows, so the
            # only pixel-mask skew is the one we engineer below
            "tpu": {"compute_dtype": "float32", "segment_capacity": 64,
                    "loss_reduction": mode},
        })

    rng = np.random.RandomState(0)
    B = 4  # 4 groups of batch_size=1
    images = rng.rand(B, 32, 32, 3).astype(np.float32)
    sem = rng.randint(0, 4, (B, 32, 32)).astype(np.int32)
    inst = rng.randint(0, 3, (B, 32, 32)).astype(np.int32)
    # skew: image 0 nearly all ignore
    sem_skew = sem.copy()
    sem_skew[0] = 255
    sem_skew[0, :2, :2] = 1
    tags = np.zeros((B, 256), np.int32)
    tags[:, :4] = 1

    def grads_and_loss(mode, sem_arr):
        cfg = make_cfg(mode)
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                    jnp.asarray(images))
        step_fn = step_lib.make_train_step(cfg)
        batch = {"image": jnp.asarray(images),
                 "semantic_label": jnp.asarray(sem_arr),
                 "instance_label": jnp.asarray(inst),
                 "semantic_tag": jnp.asarray(tags),
                 "memory": state.memory}

        # compare the resulting first-step param updates (optimizer state
        # is zero-initialized, so updates are proportional to gradients)
        new_state, metrics = jax.jit(step_fn)(state, batch)
        delta = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                             new_state.params, state.params)
        flat = np.concatenate([x.ravel() for x in jax.tree.leaves(delta)])
        return flat, float(metrics["loss"])

    upd_global, loss_global = grads_and_loss("global_mean", sem_skew)
    upd_device, loss_device = grads_and_loss("per_device_mean", sem_skew)
    denom = np.linalg.norm(upd_global) + 1e-12
    rel_skew = np.linalg.norm(upd_global - upd_device) / denom
    # skewed valid counts -> the reductions genuinely differ
    assert rel_skew > 1e-3, rel_skew
    assert not np.isclose(loss_global, loss_device, rtol=1e-4)

    # uniform valid counts -> identical per-pixel weighting, any
    # remaining difference is numerical noise
    upd_g2, loss_g2 = grads_and_loss("global_mean", sem)
    upd_d2, loss_d2 = grads_and_loss("per_device_mean", sem)
    rel_uniform = (np.linalg.norm(upd_g2 - upd_d2)
                   / (np.linalg.norm(upd_g2) + 1e-12))
    # equal per-group valid counts: the two reductions are the same sum
    # reassociated -> bitwise-identical here
    assert rel_uniform < 1e-6, rel_uniform
    np.testing.assert_allclose(loss_g2, loss_d2, rtol=1e-6)
    print(f"relative update deviation: skewed={rel_skew:.4f} "
          f"uniform={rel_uniform:.2e}")
