"""Numpy oracles implementing the reference's dynamic-shape semantics.

These deliberately mirror the *behavior* documented for twke18/SPML
(spml/utils/segsort/{common,loss}.py) using plain numpy with explicit
filtering (boolean indexing == the reference's nonzero/index_select), so
the masked static-shape JAX ops can be tested for exact equivalence.
"""

import numpy as np


def normalize(x, eps=1e-12):
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(norm, eps)


def prototypes_from_labels(emb, labels, num_protos):
    out = np.zeros((num_protos, emb.shape[-1]), emb.dtype)
    np.add.at(out, labels, emb)
    return normalize(out)


def vmf_kmeans(emb, init_labels, num_clusters, iterations):
    """M-step then E-step, `iterations` times, on the given rows only."""
    labels = init_labels.copy()
    for _ in range(iterations):
        protos = prototypes_from_labels(emb, labels, num_clusters)
        labels = np.argmax(emb @ protos.T, axis=-1)
    return labels


def segment_triples(cluster, sem, inst, valid):
    """unique (cluster, sem, inst) triples over valid pixels, sorted by
    composite key; returns (seg_id per valid pixel order, triples)."""
    keys = cluster * 256 * 256 + sem * 256 + inst
    vk = keys[valid]
    uniq, inverse = np.unique(vk, return_inverse=True)
    triples = np.stack([uniq // (256 * 256), (uniq // 256) % 256,
                        uniq % 256], axis=-1)
    return inverse, triples


def segsort_nll(emb, sem, own_idx, protos, proto_sem, kappa):
    """Reference loss.py:15-82 ('segsort+'), unmasked dense inputs."""
    sims = np.exp(kappa * (emb @ protos.T))
    own = sims[np.arange(len(emb)), own_idx]
    same = (sem[:, None] == proto_sem[None, :]).astype(np.float64)
    same_sum = (sims * same).sum(-1) - own
    numer = np.where(same_sum > 0, same_sum, own)
    diff = (sem[:, None] != proto_sem[None, :]).astype(np.float64)
    denom = (sims * diff).sum(-1) + numer
    return -np.log(numer / denom)


def set_segsort_nll(emb, tags, own_idx, protos, proto_tags, kappa):
    """Reference loss.py:85-130 ('segsort+'), multi-hot labels."""
    sims = np.exp(kappa * (emb @ protos.T))
    own = sims[np.arange(len(emb)), own_idx]
    aff = tags.astype(np.float64) @ proto_tags.T.astype(np.float64)
    same = (aff > 0).astype(np.float64)
    same_sum = (sims * same).sum(-1) - own
    numer = np.where(same_sum > 0, same_sum, own)
    diff = (aff == 0).astype(np.float64)
    denom = (sims * diff).sum(-1) + numer
    return -np.log(numer / denom)
