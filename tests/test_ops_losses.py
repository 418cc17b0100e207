import numpy as np
import jax.numpy as jnp

from spml_tpu.ops import losses, knn
from tests import oracles


def _random_problem(rng, n=40, p=12, d=8, num_classes=4):
    emb = oracles.normalize(rng.randn(n, d)).astype(np.float32)
    protos = oracles.normalize(rng.randn(p, d)).astype(np.float32)
    proto_sem = rng.randint(0, num_classes + 2, size=p)  # some >= C (invalid)
    # each pixel's own prototype must share its semantic label
    own = rng.randint(0, p, size=n)
    sem = proto_sem[own]
    return emb, protos, proto_sem, own, sem


def test_segsort_loss_matches_filtered_oracle():
    """Masked loss over full arrays == oracle over explicitly filtered
    pixels/prototypes (the reference's index_select path,
    segsort_softmax.py:184-201)."""
    rng = np.random.RandomState(0)
    num_classes = 4
    emb, protos, proto_sem, own, sem = _random_problem(rng)

    pixel_mask = sem < num_classes
    proto_mask = proto_sem < num_classes

    got = float(losses.segsort_loss(
        jnp.asarray(emb), jnp.asarray(sem), jnp.asarray(own),
        jnp.asarray(protos), jnp.asarray(proto_sem), 6.0,
        jnp.asarray(pixel_mask), jnp.asarray(proto_mask)))

    # oracle: filter prototypes, remap own indices into filtered array
    keep_p = np.where(proto_mask)[0]
    remap = -np.ones(len(protos), int)
    remap[keep_p] = np.arange(len(keep_p))
    f_emb = emb[pixel_mask]
    f_own = remap[own[pixel_mask]]
    assert np.all(f_own >= 0)  # valid pixels' own protos are valid
    nll = oracles.segsort_nll(f_emb.astype(np.float64), sem[pixel_mask],
                              f_own, protos[keep_p].astype(np.float64),
                              proto_sem[keep_p], 6.0)
    # fp32 op vs fp64 oracle: exp(kappa*cos) sums lose ~1e-4 relative
    np.testing.assert_allclose(got, nll.mean(), rtol=2e-3)


def test_set_segsort_loss_matches_oracle():
    rng = np.random.RandomState(1)
    n, p, d, c = 30, 10, 8, 5
    emb = oracles.normalize(rng.randn(n, d)).astype(np.float32)
    protos = oracles.normalize(rng.randn(p, d)).astype(np.float32)
    own = rng.randint(0, p, size=n)
    proto_tags = (rng.rand(p, c) > 0.5).astype(np.int32)
    proto_tags[rng.randint(0, p)] = 0  # a tagless prototype
    tags = proto_tags[own]  # pixel inherits its image's tags

    got = float(losses.set_segsort_loss(
        jnp.asarray(emb), jnp.asarray(tags), jnp.asarray(own),
        jnp.asarray(protos), jnp.asarray(proto_tags), 8.0,
        jnp.ones(n, bool), jnp.ones(p, bool)))

    nll = oracles.set_segsort_nll(emb.astype(np.float64), tags, own,
                                  protos.astype(np.float64), proto_tags, 8.0)
    np.testing.assert_allclose(got, nll.mean(), rtol=2e-3)


def test_set_segsort_prototype_mask_equals_filtering():
    rng = np.random.RandomState(2)
    n, p, d, c = 20, 12, 8, 4
    emb = oracles.normalize(rng.randn(n, d)).astype(np.float32)
    protos = oracles.normalize(rng.randn(p, d)).astype(np.float32)
    own = rng.randint(0, 6, size=n)  # own protos among the first 6 (valid)
    proto_mask = np.arange(p) < 6
    proto_tags = (rng.rand(p, c) > 0.4).astype(np.int32)
    tags = proto_tags[own]

    got = float(losses.set_segsort_loss(
        jnp.asarray(emb), jnp.asarray(tags), jnp.asarray(own),
        jnp.asarray(protos), jnp.asarray(proto_tags), 8.0,
        jnp.ones(n, bool), jnp.asarray(proto_mask)))
    nll = oracles.set_segsort_nll(emb.astype(np.float64), tags, own,
                                  protos[:6].astype(np.float64),
                                  proto_tags[:6], 8.0)
    np.testing.assert_allclose(got, nll.mean(), rtol=2e-3)


def test_top_k_ranking_matches_oracle():
    rng = np.random.RandomState(3)
    p, d = 15, 8
    protos = oracles.normalize(rng.randn(p, d)).astype(np.float32)
    labels = rng.randint(0, 3, size=p)
    acc, topk = knn.top_k_ranking(
        jnp.asarray(protos), jnp.asarray(labels),
        jnp.asarray(protos), jnp.asarray(labels), top_k=5)
    aff = protos @ protos.T
    idx = np.argsort(-aff, axis=1)[:, :5]
    want_acc = (labels[idx] == labels[:, None]).mean()
    np.testing.assert_allclose(float(acc), want_acc, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(topk), labels[idx])


def test_majority_label_from_topk():
    topk = jnp.asarray([[1, 1, 2], [0, 2, 2]])
    maj = knn.majority_label_from_topk(topk, 3)
    np.testing.assert_array_equal(np.asarray(maj), [1, 2])


def test_nn_multiset_labels():
    rng = np.random.RandomState(4)
    d = 8
    protos = oracles.normalize(rng.randn(4, d)).astype(np.float32)
    emb = protos.copy()  # each pixel identical to one prototype (sim=1)
    proto_sem = np.array([0, 1, 2, 5])  # last >= num_classes -> excluded
    batch_e = np.array([0, 0, 1, 1])
    batch_p = np.array([0, 0, 1, 1])
    got = np.asarray(knn.nearest_neighbor_multiset_labels(
        jnp.asarray(emb), jnp.asarray(protos), jnp.asarray(proto_sem),
        jnp.asarray(batch_e), jnp.asarray(batch_p),
        num_classes=3, top_k=1, threshold=0.95))
    # pixel0 -> proto0(class0); pixel1 -> proto1(class1);
    # pixel2 -> proto2(class2); pixel3's only same-batch valid proto is 2,
    # but sim < .95 -> masked to ignore -> all zeros
    np.testing.assert_array_equal(got[0], [1, 0, 0])
    np.testing.assert_array_equal(got[1], [0, 1, 0])
    np.testing.assert_array_equal(got[2], [0, 0, 1])
    np.testing.assert_array_equal(got[3], [0, 0, 0])
