"""Tensor algebra shared across the segsort ops.

Behavioral reference: spml/utils/general/common.py in twke18/SPML
(normalize_embedding:101, one_hot:76, segment_mean:123, resize_labels:11,
pca:45). Re-designed for XLA: everything is static-shape; scatter-style
reductions become one-hot matmuls so they land on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS_NORM = 1e-12


def normalize_embedding(embeddings: jnp.ndarray, eps: float = EPS_NORM) -> jnp.ndarray:
    """L2-normalizes along the last axis with an eps floor on the norm.

    Matches the reference semantics (norm < eps -> divide by eps), so a
    zero vector maps to a zero vector. The floor is clamped INSIDE the
    sqrt: sqrt'(0) = inf would otherwise poison the backward pass with
    0 * inf = NaN for all-zero rows (e.g. empty-segment prototypes),
    which `jnp.maximum` after the sqrt does NOT prevent.
    """
    sq = jnp.sum(jnp.square(embeddings), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return embeddings / norm


def one_hot(labels: jnp.ndarray, num_classes: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot encoding; out-of-range labels produce all-zero rows."""
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def segment_sum(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum of `values` [N, D] per segment id [N] -> [num_segments, D].

    Expressed as one_hot(seg)ᵀ @ values so XLA maps it to an MXU matmul
    instead of a serial scatter. `weights` [N] optionally scales each row
    (used for validity masking). Out-of-range ids contribute nothing.
    """
    oh = one_hot(seg_ids, num_segments, dtype=values.dtype)
    if weights is not None:
        oh = oh * weights[:, None].astype(values.dtype)
    return jnp.einsum("np,nd->pd", oh, values)


def segment_mean(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean of `values` per segment (empty segments -> zeros).

    Reference: segment_mean at spml/utils/general/common.py:123 (divides
    by max(count, 1)).
    """
    if weights is None:
        weights = jnp.ones(values.shape[0], values.dtype)
    sums = segment_sum(values, seg_ids, num_segments, weights)
    ones = weights[:, None].astype(values.dtype)
    counts = segment_sum(ones, seg_ids, num_segments)
    counts = jnp.maximum(counts, 1.0)
    return sums / counts


def resize_labels(labels: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor label resize matching torch F.interpolate(nearest).

    torch 'nearest' picks src = floor(dst * in/out); we replicate that
    index arithmetic exactly so label/embedding alignment matches the
    reference (spml/utils/general/common.py:11).
    """
    h, w = labels.shape[-2:]
    nh, nw = size
    ys = jnp.floor(jnp.arange(nh) * (h / nh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(nw) * (w / nw)).astype(jnp.int32)
    out = jnp.take(labels, ys, axis=-2)
    out = jnp.take(out, xs, axis=-1)
    return out


def calculate_principal_components(embeddings: jnp.ndarray,
                                   num_components: int = 3) -> jnp.ndarray:
    """Principal directions of [N, D] embeddings (for PCA visualisation)."""
    centered = embeddings - jnp.mean(embeddings, axis=0, keepdims=True)
    _, _, vt = jnp.linalg.svd(centered, full_matrices=False)
    return vt[:num_components].T


def pca(embeddings: jnp.ndarray, num_components: int = 3,
        principal_components: jnp.ndarray | None = None) -> jnp.ndarray:
    shape = embeddings.shape
    flat = embeddings.reshape(-1, shape[-1])
    if principal_components is None:
        principal_components = calculate_principal_components(flat, num_components)
    out = flat @ principal_components
    return out.reshape(*shape[:-1], num_components)


def generate_location_features(height: int, width: int,
                               dtype=jnp.float32) -> jnp.ndarray:
    """Normalized (y, x) grid in [0, 1] stacked last -> [H, W, 2].

    Reference: generate_location_features('float') at
    spml/utils/segsort/common.py:156 (linspace 0..1 per axis).
    """
    y = jnp.linspace(0.0, 1.0, height, dtype=dtype)
    x = jnp.linspace(0.0, 1.0, width, dtype=dtype)
    yy = jnp.broadcast_to(y[:, None], (height, width))
    xx = jnp.broadcast_to(x[None, :], (height, width))
    return jnp.stack([yy, xx], axis=-1)
