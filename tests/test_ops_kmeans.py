import numpy as np
import jax
import jax.numpy as jnp

from spml_tpu.ops import common, kmeans
from tests import oracles


def test_initialize_cluster_labels_grid():
    labels = np.asarray(kmeans.initialize_cluster_labels((3, 2), (9, 8)))
    # y + ky * x with linspace-round banding
    y = np.round(np.linspace(0, 2, 9)).astype(int)
    x = np.round(np.linspace(0, 1, 8)).astype(int)
    want = y[:, None] + 3 * x[None, :]
    np.testing.assert_array_equal(labels, want)
    assert labels.max() == 5


def test_masked_kmeans_equals_subset_kmeans():
    """Zero-weighting invalid pixels must equal dropping them (the
    reference's index_select path)."""
    rng = np.random.RandomState(1)
    n, d, k = 200, 6, 4
    emb = oracles.normalize(rng.randn(n, d)).astype(np.float32)
    init = rng.randint(0, k, size=n)
    valid = rng.rand(n) > 0.3

    got = np.asarray(kmeans.kmeans_with_initial_labels(
        jnp.asarray(emb), jnp.asarray(init.astype(np.int32)), k, 10,
        jnp.asarray(valid.astype(np.float32))))
    want = oracles.vmf_kmeans(emb[valid].astype(np.float64),
                              init[valid], k, 10)
    np.testing.assert_array_equal(got[valid], want)


def test_compact_unique_matches_np_unique():
    rng = np.random.RandomState(2)
    keys = rng.randint(0, 12, size=64).astype(np.int32)
    valid = rng.rand(64) > 0.2
    seg, keep = kmeans.compact_unique_segments(
        jnp.asarray(keys), jnp.asarray(valid), capacity=16)
    seg, keep = np.asarray(seg), np.asarray(keep)
    uniq, inverse = np.unique(keys[valid], return_inverse=True)
    np.testing.assert_array_equal(seg[valid], inverse)
    np.testing.assert_array_equal(keep, valid)


def test_compact_unique_overflow_is_masked():
    keys = jnp.arange(10, dtype=jnp.int32)  # 10 distinct segments
    valid = jnp.ones(10, bool)
    seg, keep = kmeans.compact_unique_segments(keys, valid, capacity=4)
    seg, keep = np.asarray(seg), np.asarray(keep)
    np.testing.assert_array_equal(keep, np.arange(10) < 4)
    np.testing.assert_array_equal(seg[:4], np.arange(4))
    assert np.all(seg <= 3)


def test_segment_batch_forms_unique_triples():
    rng = np.random.RandomState(3)
    b, h, w, d = 2, 16, 16, 8
    emb = rng.randn(b, h, w, d).astype(np.float32)
    loc = np.broadcast_to(
        np.asarray(common.generate_location_features(h, w)) - 0.5,
        (b, h, w, 2)).astype(np.float32)
    sem = rng.randint(0, 3, size=(b, h, w)).astype(np.int32)
    inst = rng.randint(0, 2, size=(b, h, w)).astype(np.int32)
    sem[0, :4] = 255  # ignore region

    segs, emb_flat, emb_loc = kmeans.segment_batch(
        jnp.asarray(emb), jnp.asarray(loc), jnp.asarray(sem),
        jnp.asarray(inst), num_clusters=(2, 2), capacity=64, iterations=10,
        ignore_index=255)

    for i in range(b):
        seg_ids = np.asarray(segs.pixel_segment_ids[i])
        keep = np.asarray(segs.pixel_valid[i])
        valid = (sem[i].reshape(-1) != 255)
        np.testing.assert_array_equal(keep, valid)  # no overflow at cap 64
        # each segment has a single (sem, inst) pair and matches the
        # recorded per-segment attributes
        sv = np.asarray(segs.segment_valid[i])
        ssem = np.asarray(segs.segment_semantic[i])
        sinst = np.asarray(segs.segment_instance[i])
        for s in np.unique(seg_ids[keep]):
            sel = keep & (seg_ids == s)
            assert sv[s]
            assert len(np.unique(sem[i].reshape(-1)[sel])) == 1
            assert ssem[s] == sem[i].reshape(-1)[sel][0]
            assert sinst[s] == inst[i].reshape(-1)[sel][0]
        # invalid segments beyond the used ones
        assert sv.sum() == len(np.unique(seg_ids[keep]))

    # normalized embedding outputs
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb_flat), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb_loc), axis=-1), 1.0, rtol=1e-5)


def test_segments_respect_kmeans_partition():
    """Pixels in the same segment must share a k-means cluster; the
    recorded segment_cluster matches."""
    rng = np.random.RandomState(4)
    b, h, w, d = 1, 12, 12, 4
    emb = rng.randn(b, h, w, d).astype(np.float32)
    loc = (np.asarray(common.generate_location_features(h, w)) - 0.5)[None]
    sem = np.zeros((b, h, w), np.int32)
    inst = np.zeros((b, h, w), np.int32)
    segs, _, emb_loc = kmeans.segment_batch(
        jnp.asarray(emb), jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(sem), jnp.asarray(inst),
        num_clusters=(3, 3), capacity=32, iterations=10)
    # recompute clusters with the oracle on all pixels (all valid)
    grid = np.asarray(kmeans.initialize_cluster_labels((3, 3), (h, w)))
    oracle_clusters = oracles.vmf_kmeans(
        np.asarray(emb_loc[0], np.float64), grid.reshape(-1), 9, 10)
    seg_ids = np.asarray(segs.pixel_segment_ids[0])
    seg_cluster = np.asarray(segs.segment_cluster[0])
    np.testing.assert_array_equal(seg_cluster[seg_ids], oracle_clusters)


def test_find_majority_label():
    sem = jnp.asarray([0, 0, 1, 1, 1, 2])
    clu = jnp.asarray([0, 0, 0, 1, 1, 1])
    select, maj = kmeans.find_majority_label_index(sem, clu, 2, 3)
    np.testing.assert_array_equal(np.asarray(maj), [0, 1])
    np.testing.assert_array_equal(
        np.asarray(select), [True, True, False, True, True, False])


def test_single_group_fast_path():
    """segment_batch_single_group == segment_batch on fake uniform
    labels, up to segment relabeling (same pixel partition, same
    per-segment prototype SET, same validity count)."""
    rng = np.random.RandomState(11)
    b, h, w, d = 2, 16, 16, 8
    emb = rng.randn(b, h, w, d).astype(np.float32)
    loc = np.broadcast_to(
        np.asarray(kmeans.common.generate_location_features(h, w) - 0.5),
        (b, h, w, 2))
    sem = np.zeros((b, h, w), np.int32)
    sem[:, :, 13:] = 255  # ignore padding stripe
    inst = np.zeros((b, h, w), np.int32)
    k = 9

    segs_f, emb_flat_f = kmeans.segment_batch_single_group(
        jnp.asarray(emb), jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(sem), (3, 3), iterations=10)
    segs_s, emb_flat_s, _ = kmeans.segment_batch(
        jnp.asarray(emb), jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(sem), jnp.asarray(inst),
        num_clusters=(3, 3), capacity=k, iterations=10)
    np.testing.assert_allclose(np.asarray(emb_flat_f),
                               np.asarray(emb_flat_s), rtol=1e-6)

    for i in range(b):
        vf = np.asarray(segs_f.pixel_valid[i])
        vs = np.asarray(segs_s.pixel_valid[i])
        np.testing.assert_array_equal(vf, vs)
        idf = np.asarray(segs_f.pixel_segment_ids[i])[vf]
        ids = np.asarray(segs_s.pixel_segment_ids[i])[vs]
        # same partition: canonical first-occurrence relabeling agrees
        _, canon_f = np.unique(idf, return_inverse=True)
        _, canon_s = np.unique(ids, return_inverse=True)
        # np.unique sorts keys; both paths keep ascending-cluster order,
        # so the canonical inverse labels must match exactly
        np.testing.assert_array_equal(canon_f, canon_s)
        assert (np.asarray(segs_f.segment_valid[i]).sum()
                == np.asarray(segs_s.segment_valid[i]).sum())
        # per-segment prototype sets agree (sorted row-wise)
        pf = np.asarray(kmeans.calculate_prototypes_from_labels(
            emb_flat_f[i], segs_f.pixel_segment_ids[i], k,
            segs_f.pixel_valid[i].astype(np.float32)))
        ps = np.asarray(kmeans.calculate_prototypes_from_labels(
            emb_flat_s[i], segs_s.pixel_segment_ids[i], k,
            segs_s.pixel_valid[i].astype(np.float32)))
        pf = pf[np.asarray(segs_f.segment_valid[i])]
        ps = ps[np.asarray(segs_s.segment_valid[i])]
        np.testing.assert_allclose(
            pf[np.lexsort(pf.T)], ps[np.lexsort(ps.T)],
            rtol=1e-5, atol=1e-6)
