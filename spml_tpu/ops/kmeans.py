"""Static-shape spherical (vMF) k-means and segment formation.

Behavioral reference: spml/utils/segsort/common.py in twke18/SPML
(initialize_cluster_labels:129, kmeans_with_initial_labels:67,
calculate_prototypes_from_labels:11, find_nearest_prototypes:44,
prepare_prototype_labels:192, find_majority_label_index:221,
segment_by_kmeans:270).

TPU re-design
-------------
The reference drops ignore-labeled pixels with ``nonzero``/``index_select``
and re-indexes clusters with ``torch.unique`` — all data-dependent shapes.
Here every image keeps its full H*W pixel grid plus a validity mask:

* the k-means M-step is a masked one-hot matmul (MXU) instead of
  scatter_add, the E-step a plain matmul + argmax;
* ``unique``-style segment compaction is done with a sort + adjacent-diff
  + cumsum under a fixed per-image segment capacity, with overflow and
  invalid pixels routed to a masked-out bin;
* the per-image Python loop becomes ``jax.vmap`` over the batch, so all
  images cluster in parallel as batched matmuls.

Equivalences with the reference (relied on by tests):
* empty clusters keep zero prototypes in both versions (scatter_add of
  nothing == masked sum of nothing, both L2-normalize to ~0);
* masking invalid pixels' weight to zero in the M-step equals removing
  them, and their E-step assignment is never read;
* per-batch global segment re-indexing (models/utils.py:94-111) never
  merges segments across images, so forming segments per image and
  offsetting by image index is exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spml_tpu.ops import common

INVALID_KEY = jnp.iinfo(jnp.int32).max


def initialize_cluster_labels(num_clusters: tuple[int, int],
                              img_dims: tuple[int, int]) -> jnp.ndarray:
    """Uniform grid partition labels [H, W] in [0, ky*kx).

    Matches reference common.py:129 (linspace + round-half-even;
    label = y + ky * x).
    """
    ky, kx = num_clusters
    h, w = img_dims
    y_labels = jnp.round(jnp.linspace(0.0, ky - 1, h)).astype(jnp.int32)
    x_labels = jnp.round(jnp.linspace(0.0, kx - 1, w)).astype(jnp.int32)
    return y_labels[:, None] + ky * x_labels[None, :]


def calculate_prototypes_from_labels(embeddings: jnp.ndarray,
                                     labels: jnp.ndarray,
                                     num_prototypes: int,
                                     weights: jnp.ndarray | None = None
                                     ) -> jnp.ndarray:
    """Masked M-step: L2-normalized per-label sum of embeddings.

    Reference common.py:11 (scatter_add + normalize). `weights` masks out
    invalid pixels; out-of-range labels contribute nothing.
    """
    sums = common.segment_sum(embeddings, labels, num_prototypes, weights)
    return common.normalize_embedding(sums)


def find_nearest_prototypes(embeddings: jnp.ndarray,
                            prototypes: jnp.ndarray) -> jnp.ndarray:
    """E-step: argmax cosine similarity (embeddings are pre-normalized)."""
    sims = jnp.einsum("nd,pd->np", embeddings, prototypes)
    return jnp.argmax(sims, axis=-1).astype(jnp.int32)


def kmeans_with_initial_labels(embeddings: jnp.ndarray,
                               initial_labels: jnp.ndarray,
                               num_clusters: int,
                               iterations: int,
                               weights: jnp.ndarray | None = None
                               ) -> jnp.ndarray:
    """vMF k-means (reference common.py:67): `iterations` x (M-step, E-step).

    Static iteration count -> unrolled/scanned by XLA; no data-dependent
    control flow.
    """

    def body(labels, _):
        protos = calculate_prototypes_from_labels(
            embeddings, labels, num_clusters, weights)
        return find_nearest_prototypes(embeddings, protos), None

    labels, _ = jax.lax.scan(body, initial_labels, None, length=iterations)
    return labels


class Segments(NamedTuple):
    """Fixed-capacity segments of a single image (or a batch when any
    leading axes are added by vmap).

    Attributes:
      pixel_segment_ids: [N] int32 in [0, capacity); id of each pixel's
        segment. Invalid / overflowed pixels point at a masked bin.
      pixel_valid: [N] bool; False for ignore-label or overflowed pixels.
      segment_valid: [capacity] bool.
      segment_semantic: [capacity] int32 semantic label per segment.
      segment_instance: [capacity] int32 instance label per segment.
      segment_cluster: [capacity] int32 k-means cluster per segment.
    """
    pixel_segment_ids: jnp.ndarray
    pixel_valid: jnp.ndarray
    segment_valid: jnp.ndarray
    segment_semantic: jnp.ndarray
    segment_instance: jnp.ndarray
    segment_cluster: jnp.ndarray


def compact_unique_segments(keys: jnp.ndarray,
                            valid: jnp.ndarray,
                            capacity: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch.unique(return_inverse=True) under a fixed capacity.

    Args:
      keys: [N] int32/int64 composite segment keys.
      valid: [N] bool.
      capacity: max number of distinct segments kept.

    Returns:
      seg_ids: [N] int32 compact ids; rank order == ascending key order,
        matching torch.unique's sorted output. Invalid/overflow pixels get
        id == capacity - 1 but are flagged False in `keep`.
      keep: [N] bool — valid pixels whose segment fit within capacity.
    """
    masked = jnp.where(valid, keys, INVALID_KEY)
    # one lax.sort carrying the iota gives BOTH the sorted keys and the
    # permutation — argsort followed by masked[order] re-gathers the keys
    # through a 1 ms random-access gather the sort already produced.
    # Ties can land in any order: ranks (cumsum of key-change flags)
    # depend only on key VALUES, and all pixels of a segment share their
    # attrs, so every output is unchanged.
    sorted_keys, order = jax.lax.sort(
        (masked, jnp.arange(masked.shape[0], dtype=jnp.int32)),
        num_keys=1)
    newflag = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    ranks = jnp.cumsum(newflag.astype(jnp.int32)) - 1
    sorted_valid = sorted_keys != INVALID_KEY
    seg_sorted = jnp.where(sorted_valid, ranks, capacity)
    seg_ids = jnp.zeros_like(seg_sorted).at[order].set(seg_sorted)
    keep = (seg_ids < capacity) & valid
    seg_ids = jnp.minimum(seg_ids, capacity - 1)
    return seg_ids.astype(jnp.int32), keep


def _segment_attrs(seg_ids: jnp.ndarray, keep: jnp.ndarray,
                   attrs, fills, capacity: int):
    """Per-segment attr readout + validity, as ONE one-hot matmul.

    All pixels of a segment share each attr by construction of the
    composite key, so attr_of_segment = sum(attr * onehot) / count. The
    previous formulation was one [N]->[capacity] scatter per attr
    (~0.65 ms/step each vmapped at flagship scale — TPU scatters are
    element-serialized) while the iota-compare one-hot fuses into an
    MXU matmul (the same mechanism as the k-means prototype sums).

    Exact, not approximate: attr values are small nonneg ints (labels
    come from uint8 PNGs, cluster ids < k; integers <= 256 are exact in
    bfloat16), attr*count <= 255*N < 2^24 accumulates exactly in f32,
    and (x*c)/c is correctly rounded to the representable integer x.
    Locked against the numpy scatter oracle in tests/test_ops_kmeans.py.

    Returns ([capacity] array per attr, [capacity] bool validity).
    """
    onehot = ((seg_ids[:, None]
               == jnp.arange(capacity, dtype=seg_ids.dtype)[None, :])
              & keep[:, None]).astype(jnp.bfloat16)
    stacked = jnp.stack(
        [a.astype(jnp.bfloat16) for a in attrs]
        + [jnp.ones_like(seg_ids, jnp.bfloat16)], axis=-1)
    out = jnp.einsum("np,nk->pk", onehot, stacked,
                     preferred_element_type=jnp.float32)
    counts = out[:, -1]
    present = counts > 0
    safe = jnp.maximum(counts, 1.0)
    vals = [jnp.where(present, out[:, i] / safe, fill).astype(a.dtype)
            for i, (a, fill) in enumerate(zip(attrs, fills))]
    return vals, present


def segment_image(embeddings_with_loc: jnp.ndarray,
                  semantic_labels: jnp.ndarray,
                  instance_labels: jnp.ndarray,
                  num_clusters: tuple[int, int],
                  capacity: int,
                  iterations: int = 10,
                  ignore_index: int = 255,
                  grid_labels: jnp.ndarray | None = None,
                  label_cap: int = 256) -> Segments:
    """Per-image segment formation (reference segment_by_kmeans:270).

    1. vMF k-means on (embedding ++ location) over valid pixels with a
       uniform-grid initialization;
    2. partition the clusters by ground-truth (semantic, instance) panoptic
       label: final segments = unique (cluster, semantic, instance) triples
       (exactly the reference's two `unique` passes at common.py:398-405 +
       models/utils.py:94-111, which never merge across images).

    Args:
      embeddings_with_loc: [N, D+L] L2-normalized embedding++location rows.
      semantic_labels / instance_labels: [N] int32 (already resized to the
        embedding grid).
      capacity: fixed per-image segment capacity.
      label_cap: exclusive upper bound for label values when building the
        composite sort key (labels are clipped into [0, label_cap)).
    """
    n = embeddings_with_loc.shape[0]
    ky, kx = num_clusters
    k = ky * kx
    if grid_labels is None:
        raise ValueError("grid_labels must be precomputed for a 1-D pixel "
                         "array; use segment_batch for [H,W] inputs")
    valid = semantic_labels != ignore_index
    weights = valid.astype(embeddings_with_loc.dtype)

    cluster = kmeans_with_initial_labels(
        embeddings_with_loc, grid_labels, k, iterations, weights)

    # Composite key (cluster, semantic, instance) in int32; statically
    # assert it fits (k * label_cap^2 < 2^31 for all configs in use).
    assert k * label_cap * label_cap < 2**31, "composite key overflows int32"
    sem_c = jnp.clip(semantic_labels, 0, label_cap - 1).astype(jnp.int32)
    inst_c = jnp.clip(instance_labels, 0, label_cap - 1).astype(jnp.int32)
    keys = (cluster.astype(jnp.int32) * (label_cap * label_cap)
            + sem_c * label_cap + inst_c)

    seg_ids, keep = compact_unique_segments(keys, valid, capacity)

    (seg_sem, seg_inst, seg_cluster), seg_valid = _segment_attrs(
        seg_ids, keep, (semantic_labels, instance_labels, cluster),
        (ignore_index, 0, 0), capacity)

    return Segments(pixel_segment_ids=seg_ids,
                    pixel_valid=keep,
                    segment_valid=seg_valid,
                    segment_semantic=seg_sem,
                    segment_instance=seg_inst,
                    segment_cluster=seg_cluster)


def segment_batch(embeddings: jnp.ndarray,
                  local_features: jnp.ndarray,
                  semantic_labels: jnp.ndarray,
                  instance_labels: jnp.ndarray,
                  num_clusters: tuple[int, int],
                  capacity: int,
                  iterations: int = 10,
                  ignore_index: int = 255,
                  label_cap: int = 256):
    """Batched segment formation.

    Args:
      embeddings: [B, H, W, D] raw (unnormalized) pixel embeddings.
      local_features: [B, H, W, L] location(+color) features.
      semantic_labels / instance_labels: [B, H, W] int32.

    Returns:
      (segments, emb_flat, emb_loc_flat) where segments is a Segments
      pytree with leading batch axis and emb{_loc}_flat are
      [B, H*W, D(+L)] L2-normalized pixel rows (reference returns exactly
      these two flavors from segment_by_kmeans:407).
    """
    b, h, w, d = embeddings.shape
    emb = common.normalize_embedding(embeddings.astype(jnp.float32))
    emb_flat = emb.reshape(b, h * w, d)
    loc_flat = local_features.astype(jnp.float32).reshape(b, h * w, -1)
    emb_loc = common.normalize_embedding(
        jnp.concatenate([emb_flat, loc_flat], axis=-1))

    grid = initialize_cluster_labels(num_clusters, (h, w)).reshape(-1)
    sem_flat = semantic_labels.reshape(b, h * w).astype(jnp.int32)
    inst_flat = instance_labels.reshape(b, h * w).astype(jnp.int32)

    seg_fn = jax.vmap(
        lambda e, s, i: segment_image(
            e, s, i, num_clusters, capacity, iterations, ignore_index,
            grid_labels=grid, label_cap=label_cap))
    segments = seg_fn(emb_loc, sem_flat, inst_flat)
    return segments, emb_flat, emb_loc


def segment_batch_single_group(embeddings: jnp.ndarray,
                               local_features: jnp.ndarray,
                               semantic_labels: jnp.ndarray,
                               num_clusters: tuple[int, int],
                               iterations: int = 10,
                               ignore_index: int = 255):
    """segment_batch specialized for inference's FAKE uniform labels
    (engine._fake_labels: every valid pixel shares (sem=0, inst=0)).

    With a single label group, the unique (cluster, semantic, instance)
    triples are exactly the occupied k-means clusters, so the sort-based
    unique compaction reduces to the identity relabeling. Every
    downstream consumer (per-segment prototypes, KNN majority vote,
    per-pixel scatter) is invariant to segment RELABELING, so this is
    exact — and it skips the [N]-argsort + scatters that dominate the
    1024-bucket inference member (MSC_PROFILE.json: 42.5 of 47 ms).
    Equivalence is locked by
    tests/test_ops_kmeans.py::test_single_group_fast_path.

    Returns (Segments, emb_flat) with capacity == prod(num_clusters);
    segment ids ARE the k-means cluster indices, and empty clusters
    appear as invalid segment slots.
    """
    b, h, w, d = embeddings.shape
    k = num_clusters[0] * num_clusters[1]
    emb = common.normalize_embedding(embeddings.astype(jnp.float32))
    emb_flat = emb.reshape(b, h * w, d)
    loc_flat = local_features.astype(jnp.float32).reshape(b, h * w, -1)
    emb_loc = common.normalize_embedding(
        jnp.concatenate([emb_flat, loc_flat], axis=-1))
    grid = initialize_cluster_labels(num_clusters, (h, w)).reshape(-1)
    sem_flat = semantic_labels.reshape(b, h * w).astype(jnp.int32)

    def one(el, sem):
        valid = sem != ignore_index
        wts = valid.astype(jnp.float32)
        # the XLA E/M formulation is kept deliberately: a fused Pallas
        # E+M sweep measured 4x SLOWER (cross-lane argmax; XLA already
        # fuses the one-hot into the matmul — PERF.md negative result)
        cluster = kmeans_with_initial_labels(el, grid, k, iterations,
                                             wts)
        seg_ids = jnp.where(valid, cluster, 0).astype(jnp.int32)
        seg_valid = jnp.zeros((k,), bool).at[
            jnp.where(valid, cluster, k)].set(True, mode="drop")
        return Segments(
            pixel_segment_ids=seg_ids,
            pixel_valid=valid,
            segment_valid=seg_valid,
            segment_semantic=jnp.where(seg_valid, 0,
                                       ignore_index).astype(jnp.int32),
            segment_instance=jnp.zeros((k,), jnp.int32),
            segment_cluster=jnp.arange(k, dtype=jnp.int32))

    # inference batches are size 1; a static loop avoids vmapping the
    # Pallas call
    per_image = [one(emb_loc[i], sem_flat[i]) for i in range(b)]
    segs = jax.tree.map(lambda *xs: jnp.stack(xs), *per_image)
    return segs, emb_flat


def find_majority_label_index(semantic_labels: jnp.ndarray,
                              cluster_labels: jnp.ndarray,
                              num_clusters: int,
                              num_classes: int,
                              valid: jnp.ndarray | None = None):
    """Majority semantic label per cluster + per-pixel agreement mask.

    Reference common.py:221. Returns (select_mask [N], majority [K]).
    """
    oh_sem = common.one_hot(semantic_labels, num_classes)
    if valid is not None:
        oh_sem = oh_sem * valid[:, None].astype(oh_sem.dtype)
    counts = common.segment_sum(oh_sem, cluster_labels, num_clusters)
    majority = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    pixel_majority = jnp.take(majority, jnp.clip(cluster_labels, 0,
                                                 num_clusters - 1))
    select = pixel_majority == semantic_labels
    if valid is not None:
        select = select & valid
    return select, majority
