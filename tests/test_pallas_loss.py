"""Fused Pallas segsort loss vs the dense XLA formulation (values AND
gradients). Runs in interpret mode on CPU; the same code compiles on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spml_tpu.ops import losses
from spml_tpu.ops.pallas import segsort_loss as fused
from tests import oracles


def _problem(rng, n=300, p=40, d=16, c=5):
    emb = oracles.normalize(rng.randn(n, d)).astype(np.float32)
    protos = oracles.normalize(rng.randn(p, d)).astype(np.float32)
    proto_sem = rng.randint(0, c + 2, size=p).astype(np.int32)
    proto_valid = rng.rand(p) > 0.2
    own = rng.randint(0, p, size=n).astype(np.int32)
    sem = proto_sem[own]
    pixel_mask = (sem < c) & proto_valid[own]
    return (jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(own),
            jnp.asarray(protos), jnp.asarray(proto_sem),
            jnp.asarray(pixel_mask), jnp.asarray(proto_valid))


def test_fused_matches_dense_forward():
    rng = np.random.RandomState(0)
    emb, sem, own, protos, proto_sem, pmask, pvalid = _problem(rng)
    dense = losses.segsort_loss(emb, sem, own, protos, proto_sem, 6.0,
                                pmask, pvalid & (proto_sem < 5))
    fused_val = fused.fused_segsort_loss(
        emb, sem, own, protos, jnp.where(proto_sem < 5, proto_sem, -1),
        6.0, pmask, pvalid, interpret=True)
    np.testing.assert_allclose(float(fused_val), float(dense), rtol=1e-5)


def test_fused_matches_dense_gradients():
    rng = np.random.RandomState(1)
    emb, sem, own, protos, proto_sem, pmask, pvalid = _problem(
        rng, n=256, p=24)

    def dense_fn(e, p):
        return losses.segsort_loss(e, sem, own, p, proto_sem, 6.0,
                                   pmask, pvalid & (proto_sem < 5))

    def fused_fn(e, p):
        return fused.fused_segsort_loss(
            e, sem, own, p, jnp.where(proto_sem < 5, proto_sem, -1),
            6.0, pmask, pvalid, interpret=True)

    gd_e, gd_p = jax.grad(dense_fn, argnums=(0, 1))(emb, protos)
    gf_e, gf_p = jax.grad(fused_fn, argnums=(0, 1))(emb, protos)
    np.testing.assert_allclose(np.asarray(gf_e), np.asarray(gd_e),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gd_p),
                               rtol=1e-4, atol=1e-7)


def test_fused_padding_invariance():
    """Different (already-aligned vs ragged) sizes give identical results
    for the covered rows."""
    rng = np.random.RandomState(2)
    emb, sem, own, protos, proto_sem, pmask, pvalid = _problem(
        rng, n=256, p=512)
    v1 = fused.fused_segsort_loss(
        emb, sem, own, protos, jnp.where(proto_sem < 5, proto_sem, -1),
        6.0, pmask, pvalid, interpret=True)
    # add ragged padding-sized junk prototypes marked invalid
    extra = jnp.asarray(oracles.normalize(
        rng.randn(37, emb.shape[1])).astype(np.float32))
    protos2 = jnp.concatenate([protos, extra], 0)
    plab2 = jnp.concatenate(
        [jnp.where(proto_sem < 5, proto_sem, -1),
         jnp.full((37,), 3, jnp.int32)], 0)
    pvalid2 = jnp.concatenate([pvalid, jnp.zeros((37,), bool)], 0)
    v2 = fused.fused_segsort_loss(emb, sem, own, protos2, plab2, 6.0,
                                  pmask, pvalid2, interpret=True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)


def test_train_step_with_fused_loss_matches_dense():
    """Full train step with tpu.use_fused_loss on vs off: identical loss
    (interpret-mode Pallas on CPU)."""
    import jax
    import jax.numpy as jnp
    from unittest import mock

    from spml_tpu.config import load_config
    from spml_tpu.ops.pallas import segsort_loss as fused_mod
    from spml_tpu.train import step as step_lib

    overrides = {
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_num_clusters": [2, 2],
                    "kmeans_iterations": 2},
        "dataset": {"num_classes": 4},
        "train": {"batch_size": 2, "crop_size": [32, 32],
                  "memory_bank_size": 1, "max_iteration": 100,
                  "warmup_iteration": 10},
        "tpu": {"segment_capacity": 32, "compute_dtype": "float32"},
    }
    rng = np.random.RandomState(3)
    batch = {
        "image": jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
        "semantic_label": jnp.asarray(rng.randint(0, 5, (2, 32, 32)),
                                      jnp.int32),
        "instance_label": jnp.asarray(rng.randint(0, 3, (2, 32, 32)),
                                      jnp.int32),
        "semantic_tag": jnp.asarray(rng.rand(2, 256) > 0.6, jnp.int32),
    }
    results = {}
    orig = fused_mod.fused_segsort_loss
    orig_set = fused_mod.fused_set_segsort_loss
    orig_joint = fused_mod.fused_joint_losses
    with mock.patch.object(
            fused_mod, "fused_segsort_loss",
            lambda *a, **k: orig(*a, **{**k, "interpret": True})), \
        mock.patch.object(
            fused_mod, "fused_set_segsort_loss",
            lambda *a, **k: orig_set(*a, **{**k, "interpret": True})), \
        mock.patch.object(
            fused_mod, "fused_joint_losses",
            lambda *a, **k: orig_joint(*a, **{**k, "interpret": True})):
        for use_fused in (False, True):
            cfg = load_config(overrides=overrides)
            cfg.tpu.use_fused_loss = use_fused
            state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                        jnp.zeros((2, 32, 32, 3)))
            step = step_lib.make_train_step(cfg)  # no jit: allow mock
            _, metrics = step(state, batch)
            results[use_fused] = float(metrics["loss"])
    np.testing.assert_allclose(results[True], results[False], rtol=1e-5)


def test_fused_set_matches_dense():
    rng = np.random.RandomState(4)
    n, p, d, c = 300, 40, 16, 5
    emb = jnp.asarray(oracles.normalize(rng.randn(n, d)).astype(np.float32))
    protos = jnp.asarray(
        oracles.normalize(rng.randn(p, d)).astype(np.float32))
    own = jnp.asarray(rng.randint(0, p, n).astype(np.int32))
    proto_tags = jnp.asarray((rng.rand(p, c) > 0.5).astype(np.int32))
    tags = jnp.take(proto_tags, own, axis=0)
    pvalid = jnp.asarray(rng.rand(p) > 0.25)
    pmask = jnp.ones(n, bool)

    dense = losses.set_segsort_loss(emb, tags, own, protos, proto_tags,
                                    8.0, pmask, pvalid)
    fused_val = fused.fused_set_segsort_loss(
        emb, tags, own, protos, proto_tags, 8.0, pmask, pvalid,
        interpret=True)
    np.testing.assert_allclose(float(fused_val), float(dense), rtol=1e-5)

    # gradients
    def dense_fn(e, p_):
        return losses.set_segsort_loss(e, tags, own, p_, proto_tags, 8.0,
                                       pmask, pvalid)

    def fused_fn(e, p_):
        return fused.fused_set_segsort_loss(e, tags, own, p_, proto_tags,
                                            8.0, pmask, pvalid,
                                            interpret=True)

    gd = jax.grad(dense_fn, argnums=(0, 1))(emb, protos)
    gf = jax.grad(fused_fn, argnums=(0, 1))(emb, protos)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_compaction_exactness_low_fill():
    """Valid-prototype compaction (sort + tile skip) is exact: values and
    gradients identical with compact on/off and vs the dense oracle, at a
    low fill fraction with scattered validity and pixels whose own
    prototype is invalid."""
    rng = np.random.RandomState(7)
    n, p, d, c, t = 512, 64, 16, 5, 20
    emb = jnp.asarray(oracles.normalize(rng.randn(n, d)).astype(np.float32))
    protos = jnp.asarray(
        oracles.normalize(rng.randn(p, d)).astype(np.float32))
    proto_sem = jnp.asarray(rng.randint(0, c + 2, p).astype(np.int32))
    own = jnp.asarray(rng.randint(0, p, n).astype(np.int32))
    sem = jnp.take(proto_sem, own)
    proto_tags = jnp.asarray((rng.rand(p, t) > 0.5).astype(np.int32))
    tags = jnp.take(proto_tags, own, axis=0)
    pvalid = jnp.asarray(rng.rand(p) < 0.2)  # ~20% fill, scattered
    ann_mask = (sem < c)                     # includes invalid-own pixels
    occ_mask = jnp.ones(n, bool)
    ann_plab = jnp.where(pvalid & (proto_sem < c), proto_sem, -1)

    def joint_fn(e, p_, compact):
        ann, occ = fused.fused_joint_losses(
            e, sem, own, tags, p_, ann_plab, proto_tags, 6.0, 12.0,
            ann_mask, occ_mask, pvalid, interpret=True, compact=compact)
        return ann + 0.5 * occ

    v_on, g_on = jax.value_and_grad(
        lambda e, p_: joint_fn(e, p_, True), argnums=(0, 1))(emb, protos)
    v_off, g_off = jax.value_and_grad(
        lambda e, p_: joint_fn(e, p_, False), argnums=(0, 1))(emb, protos)
    np.testing.assert_allclose(float(v_on), float(v_off), rtol=1e-6)
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)

    # dense oracle for the ann component alone
    dense_ann = losses.segsort_loss(emb, sem, own, protos, proto_sem, 6.0,
                                    ann_mask, pvalid & (proto_sem < 5))
    fused_ann = fused.fused_segsort_loss(
        emb, sem, own, protos, ann_plab, 6.0, ann_mask, pvalid,
        interpret=True, compact=True)
    np.testing.assert_allclose(float(fused_ann), float(dense_ann),
                               rtol=1e-5)

    # set variant, compact on/off + grads
    def set_fn(e, p_, compact):
        return fused.fused_set_segsort_loss(
            e, tags, own, p_, proto_tags, 8.0, occ_mask, pvalid,
            interpret=True, compact=compact)

    vs_on, gs_on = jax.value_and_grad(
        lambda e, p_: set_fn(e, p_, True), argnums=(0, 1))(emb, protos)
    vs_off, gs_off = jax.value_and_grad(
        lambda e, p_: set_fn(e, p_, False), argnums=(0, 1))(emb, protos)
    np.testing.assert_allclose(float(vs_on), float(vs_off), rtol=1e-6)
    for a, b in zip(gs_on, gs_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_compaction_all_invalid_is_finite():
    """num_valid == 0: every tile skipped, statistics all-zero; the loss
    must come out finite (0 via the masked mean), not NaN."""
    rng = np.random.RandomState(8)
    n, p, d = 256, 32, 8
    emb = jnp.asarray(oracles.normalize(rng.randn(n, d)).astype(np.float32))
    protos = jnp.asarray(
        oracles.normalize(rng.randn(p, d)).astype(np.float32))
    own = jnp.asarray(rng.randint(0, p, n).astype(np.int32))
    sem = jnp.zeros(n, jnp.int32)
    plab = jnp.full(p, -1, jnp.int32)
    pvalid = jnp.zeros(p, bool)
    pmask = jnp.zeros(n, bool)

    val, grads = jax.value_and_grad(
        lambda e: fused.fused_segsort_loss(
            e, sem, own, protos, plab, 6.0, pmask, pvalid,
            interpret=True))(emb)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grads)))


def test_joint_kernel_matches_separate():
    """The joint (shared-logits) kernel equals the two separate fused
    losses in both values and gradients."""
    rng = np.random.RandomState(6)
    n, p, d, c, t = 300, 40, 16, 5, 20
    emb = jnp.asarray(oracles.normalize(rng.randn(n, d)).astype(np.float32))
    protos = jnp.asarray(
        oracles.normalize(rng.randn(p, d)).astype(np.float32))
    proto_sem = jnp.asarray(rng.randint(0, c + 2, p).astype(np.int32))
    own = jnp.asarray(rng.randint(0, p, n).astype(np.int32))
    sem = jnp.take(proto_sem, own)
    proto_tags = jnp.asarray((rng.rand(p, t) > 0.5).astype(np.int32))
    tags = jnp.take(proto_tags, own, axis=0)
    pvalid = jnp.asarray(rng.rand(p) > 0.2)
    ann_mask = (sem < c)
    occ_mask = jnp.ones(n, bool)
    ann_plab = jnp.where(pvalid & (proto_sem < c), proto_sem, -1)

    def joint_fn(e, p_):
        ann, occ = fused.fused_joint_losses(
            e, sem, own, tags, p_, ann_plab, proto_tags, 6.0, 12.0,
            ann_mask, occ_mask, pvalid, interpret=True)
        return ann + 0.5 * occ

    def separate_fn(e, p_):
        ann = fused.fused_segsort_loss(e, sem, own, p_, ann_plab, 6.0,
                                       ann_mask, pvalid, interpret=True)
        occ = fused.fused_set_segsort_loss(e, tags, own, p_, proto_tags,
                                           12.0, occ_mask, pvalid,
                                           interpret=True)
        return ann + 0.5 * occ

    vj, gj = jax.value_and_grad(joint_fn, argnums=(0, 1))(emb, protos)
    vs, gs = jax.value_and_grad(separate_fn, argnums=(0, 1))(emb, protos)
    np.testing.assert_allclose(float(vj), float(vs), rtol=1e-6)
    for a, b in zip(gj, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_bf16_operands_close_to_f32_forward_and_grad():
    """operand_dtype='bfloat16' numerics: values within ~1% of the f32
    kernel and gradients aligned (f32 accumulation; only the operand
    reads and the coefficient matmul inputs are rounded). This is the
    quantified delta for the tpu.loss_operand_dtype knob."""
    rng = np.random.RandomState(3)
    emb, sem, own, protos, proto_sem, pmask, pvalid = _problem(
        rng, n=256, p=64)
    plab = jnp.where(proto_sem < 5, proto_sem, -1)

    def loss_fn(dtype):
        def f(e, p):
            return fused.fused_segsort_loss(
                e, sem, own, p, plab, 6.0, pmask, pvalid,
                interpret=True, operand_dtype=dtype)
        return f

    v32, (g32_e, g32_p) = jax.value_and_grad(
        loss_fn("float32"), argnums=(0, 1))(emb, protos)
    v16, (g16_e, g16_p) = jax.value_and_grad(
        loss_fn("bfloat16"), argnums=(0, 1))(emb, protos)
    # cotangents leave the kernel in f32 regardless of operand dtype
    assert g16_e.dtype == jnp.float32 and g16_p.dtype == jnp.float32
    np.testing.assert_allclose(float(v16), float(v32), rtol=1.5e-2)

    def cos(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(g16_e, g32_e) > 0.999
    assert cos(g16_p, g32_p) > 0.999


def test_bf16_operands_joint_kernel():
    rng = np.random.RandomState(4)
    n, p, c = 256, 64, 5
    emb, sem, own, protos, proto_sem, pmask, pvalid = _problem(
        rng, n=n, p=p, c=c)
    plab = jnp.where(proto_sem < c, proto_sem, -1)
    pix_tags = jnp.asarray(rng.rand(n, c - 1) > 0.5, jnp.int32)
    proto_tags = jnp.asarray(rng.rand(p, c - 1) > 0.5, jnp.int32)

    def loss_fn(dtype):
        def f(e, pr):
            ann, occ = fused.fused_joint_losses(
                e, sem, own, pix_tags, pr, plab, proto_tags, 6.0, 12.0,
                pmask, jnp.ones_like(pmask), pvalid, interpret=True,
                operand_dtype=dtype)
            return ann + occ
        return f

    v32, g32 = jax.value_and_grad(loss_fn("float32"))(emb, protos)
    v16, g16 = jax.value_and_grad(loss_fn("bfloat16"))(emb, protos)
    np.testing.assert_allclose(float(v16), float(v32), rtol=1.5e-2)
    a, b = np.asarray(g16).ravel(), np.asarray(g32).ravel()
    # kappa_occ=12 amplifies operand rounding through exp(12*cos); at
    # this deliberately pessimistic d=16 the measured delta is cosine
    # 0.9988 / norm ratio 1.10 (flagship d=64 averages rounding down
    # further). Direction must stay tight; magnitude within a band.
    assert float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))) > 0.995
    ratio = float(np.linalg.norm(a) / np.linalg.norm(b))
    assert 0.75 < ratio < 1.3
