"""KNN retrieval / ranking over prototypes.

Behavioral reference: spml/utils/segsort/eval.py (top_k_ranking:9,
majority_label_from_topk:55) in twke18/SPML. Masked, static-shape
formulation: invalid rows/prototypes get -inf affinity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spml_tpu.ops import common

NEG_INF = -1e30


def top_k_ranking(embeddings: jnp.ndarray,
                  labels: jnp.ndarray,
                  prototypes: jnp.ndarray,
                  prototype_labels: jnp.ndarray,
                  top_k: int,
                  query_mask: jnp.ndarray | None = None,
                  prototype_mask: jnp.ndarray | None = None):
    """Top-k cosine retrieval accuracy + retrieved labels.

    Returns (accuracy scalar, top_k_labels [N, top_k]). Accuracy averages
    label agreement over all (valid query, k) pairs, as in the reference.
    """
    affinity = jnp.einsum("nd,pd->np", embeddings, prototypes,
                          preferred_element_type=jnp.float32)
    if prototype_mask is not None:
        affinity = jnp.where(prototype_mask[None, :], affinity, NEG_INF)
    top_k = min(top_k, prototypes.shape[0])
    _, topk_idx = jax.lax.top_k(affinity, top_k)
    topk_labels = jnp.take(prototype_labels, topk_idx)
    tp = (topk_labels == labels[:, None]).astype(jnp.float32)
    if query_mask is not None:
        m = query_mask.astype(jnp.float32)[:, None]
        acc = jnp.sum(tp * m) / jnp.maximum(jnp.sum(m) * top_k, 1.0)
    else:
        acc = jnp.mean(tp)
    return acc, topk_labels


def majority_label_from_topk(top_k_labels: jnp.ndarray,
                             num_classes: int) -> jnp.ndarray:
    """Majority vote over the top-k retrieved labels (eval.py:55)."""
    oh = common.one_hot(top_k_labels, num_classes)
    return jnp.argmax(jnp.sum(oh, axis=-2), axis=-1).astype(jnp.int32)


def nearest_neighbor_multiset_labels(embeddings: jnp.ndarray,
                                     prototypes: jnp.ndarray,
                                     prototype_semantic_labels: jnp.ndarray,
                                     batch_embedding_labels: jnp.ndarray,
                                     batch_prototype_labels: jnp.ndarray,
                                     num_classes: int,
                                     top_k: int = 3,
                                     threshold: float = 0.95,
                                     prototype_mask: jnp.ndarray | None = None
                                     ) -> jnp.ndarray:
    """Multi-hot label propagation by per-batch nearest labeled segments.

    Behavioral reference:
    gather_multiset_labels_per_batch_by_nearest_neighbor
    (spml/models/utils.py:157). Used by the feature-affinity loss
    (DensePose): each pixel retrieves its top-k most similar prototypes
    *within the same image* among class-labeled prototypes, keeps those
    above `threshold`, and unions their classes into a multi-hot vector.
    """
    dists = jnp.einsum("nd,pd->np", embeddings, prototypes,
                       preferred_element_type=jnp.float32)
    batch_affinity = (batch_embedding_labels[:, None]
                      == batch_prototype_labels[None, :])
    valid = (prototype_semantic_labels < num_classes)[None, :]
    if prototype_mask is not None:
        valid = valid & prototype_mask[None, :]
    allowed = batch_affinity & valid
    min_dist = jnp.min(dists)
    dists = jnp.where(allowed, dists, min_dist - 1.0)
    nn_dists, nn_idx = jax.lax.top_k(dists, top_k)
    set_labels = jnp.take(prototype_semantic_labels, nn_idx)
    set_labels = jnp.where(nn_dists < threshold, num_classes, set_labels)
    oh = common.one_hot(set_labels, num_classes + 1)
    multi_hot = (jnp.sum(oh, axis=1) > 0).astype(jnp.int32)
    return multi_hot[:, :num_classes]
