"""Pixel-to-segment contrastive (SegSort / SetSegSort) losses.

Behavioral reference: spml/utils/segsort/loss.py in twke18/SPML
(_calculate_log_likelihood:15, _one_hot_calculate_log_likelihood:85,
SegSortLoss:133, SetSegSortLoss:193), all with group_mode='segsort+'.

TPU re-design: the reference filters pixels/prototypes with
nonzero/index_select (dynamic shapes). Here both stay at fixed capacity
with boolean masks; because numerator/denominator are *sums* of
exp-similarities, zeroing a masked prototype's similarity is exactly
equivalent to removing it. The per-pixel reduction becomes a masked mean.

The sim = exp(kappa * E @ Pᵀ) matrix is the framework's hottest op; this
module is the XLA formulation (exp fused into the matmul epilogue by XLA).
A Pallas flash-style kernel that never materializes [N, P] lives in
spml_tpu/ops/pallas/ and is used when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(values.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(values * m) / denom


def segsort_log_likelihood(embeddings: jnp.ndarray,
                           own_segment_ids: jnp.ndarray,
                           same_mask: jnp.ndarray,
                           diff_mask: jnp.ndarray,
                           prototypes: jnp.ndarray,
                           concentration: float) -> jnp.ndarray:
    """-log p(pixel -> its segment) under the vMF mixture ("segsort+").

    Args:
      embeddings: [N, D] L2-normalized pixels.
      own_segment_ids: [N] int32 index of each pixel's own prototype row.
      same_mask: [N, P] float/bool — prototype is valid AND same class.
      diff_mask: [N, P] float/bool — prototype is valid AND different class.
      prototypes: [P, D] L2-normalized prototypes.
      concentration: vMF kappa.

    Returns: [N] per-pixel negative log likelihood.

    Matches reference loss.py:46-82: sim=exp(k*cos); numerator = sum of
    same-class sims minus own sim when positive, else own sim; denominator
    = numerator + sum of different-class sims.
    """
    logits = jnp.einsum("nd,pd->np", embeddings, prototypes,
                        preferred_element_type=jnp.float32)
    sims = jnp.exp(logits * concentration)
    # own-sim extraction as a one-hot masked row-sum instead of
    # take_along_axis: bitwise identical (summing a single nonzero), but
    # a streaming reduce over [N, P] instead of a random-access gather —
    # the gather was 2.3 ms/step on TPU vs ~0.3 for the fused
    # compare-multiply-reduce (trace profile in PERF.md)
    own_onehot = own_segment_ids[:, None] == jnp.arange(
        sims.shape[1], dtype=own_segment_ids.dtype)[None, :]
    own = jnp.sum(jnp.where(own_onehot, sims, 0.0), axis=1)

    same_sum = jnp.sum(sims * same_mask.astype(sims.dtype), axis=1) - own
    numerator = jnp.where(same_sum > 0, same_sum, own)
    diff_sum = jnp.sum(sims * diff_mask.astype(sims.dtype), axis=1)
    denominator = diff_sum + numerator
    return -jnp.log(numerator / denominator)


def segsort_loss(embeddings: jnp.ndarray,
                 semantic_labels: jnp.ndarray,
                 own_segment_ids: jnp.ndarray,
                 prototypes: jnp.ndarray,
                 prototype_semantic_labels: jnp.ndarray,
                 concentration: float,
                 pixel_mask: jnp.ndarray,
                 prototype_mask: jnp.ndarray,
                 reduction: str = "mean") -> jnp.ndarray:
    """SegSortLoss (reference loss.py:133) with hard labels, masked mean.

    same/diff membership is label equality against each prototype's label;
    invalid prototypes are in neither set (their sims vanish from all sums,
    identical to the reference's index_select filtering).

    reduction: "mean" = masked mean scalar; "none" = per-pixel [N] ll
    (caller applies its own masked reduction, e.g. the reference's
    per-device mean-of-means — train.py:211-219).
    """
    same = (semantic_labels[:, None] == prototype_semantic_labels[None, :])
    same = same & prototype_mask[None, :]
    diff = (semantic_labels[:, None] != prototype_semantic_labels[None, :])
    diff = diff & prototype_mask[None, :]
    ll = segsort_log_likelihood(embeddings, own_segment_ids, same, diff,
                                prototypes, concentration)
    if reduction == "none":
        return ll
    return _masked_mean(ll, pixel_mask)


def set_segsort_loss(embeddings: jnp.ndarray,
                     semantic_tags: jnp.ndarray,
                     own_segment_ids: jnp.ndarray,
                     prototypes: jnp.ndarray,
                     prototype_semantic_tags: jnp.ndarray,
                     concentration: float,
                     pixel_mask: jnp.ndarray,
                     prototype_mask: jnp.ndarray,
                     reduction: str = "mean") -> jnp.ndarray:
    """SetSegSortLoss (reference loss.py:193) with multi-hot tag labels.

    same = tag-set intersection non-empty, diff = empty intersection;
    both restricted to valid prototypes. reduction as in segsort_loss.
    """
    affinity = jnp.einsum("nc,pc->np", semantic_tags.astype(jnp.float32),
                          prototype_semantic_tags.astype(jnp.float32))
    same = (affinity > 0) & prototype_mask[None, :]
    diff = (affinity == 0) & prototype_mask[None, :]
    ll = segsort_log_likelihood(embeddings, own_segment_ids, same, diff,
                                prototypes, concentration)
    if reduction == "none":
        return ll
    return _masked_mean(ll, pixel_mask)
