"""Fused Pallas kernel for the SegSort pixel-to-prototype statistics.

The hottest op in SPML training is sims = exp(kappa * E @ P^T) over
[N pixels, P prototypes] followed by three masked row-reductions
(own-prototype similarity, same-class sum, different-class sum) — the
reference materializes the full matrix (loss.py:49-51 in twke18/SPML),
~3 GB at flagship scale. This kernel streams prototype tiles through
VMEM flash-attention-style and emits only the three [N] statistics;
the backward pass recomputes tiles and accumulates dE / dP the same way,
so peak memory is O(N + P) instead of O(N * P).

Valid-prototype compaction: the prototype array is fixed-capacity
(tpu.segment_capacity slots per image x batch x memory bank) but real
scribble/tag data fills only ~25-40% of it — the reference pays nothing
for empty slots because torch.unique shrinks its prototype matrix
dynamically. Here the fused wrappers sort prototypes valid-first (the
losses are permutation-invariant; own indices are remapped through the
inverse permutation) and hand the kernel the valid count as a
scalar-prefetch argument; whole prototype tiles past the count are
skipped with pl.when. Skipped tiles contribute exactly zero to every
statistic because the sort key is the union of the kernel's own
validity tests (label >= 0 / mask > 0) and "is some masked pixel's own
prototype", so the skip is exact, not approximate — locked by
tests/test_pallas_loss.py against the dense formulation.

Two front-ends:
* segsort_stats — hard labels (sem_ann / img_sim): same-class test is
  label equality; invalid prototypes (label -1 by convention) land in
  neither sum.
* The caller composes the final "segsort+" log-likelihood from the
  three statistics (cheap elementwise), keeping exact reference
  numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: rows of pixels x columns of prototypes per step. Tuned on
# v5e at flagship scale (N=131072, P=6144, D=64) with
# pyscripts/misc/tune_loss_tiles.py: (512, 1024) runs the joint
# fwd+bwd in 33.5 ms vs 54.0 ms at (256, 512); (1024, 1024) and
# (2048, 512) exceed the Mosaic VMEM budget and fail to compile.
BLOCK_N = 512
BLOCK_P = 1024


def _op_dtype(name: str):
    """Kernel operand dtype for the embedding/prototype matrices.

    'bfloat16' halves the HBM bytes the streaming kernels move and lets
    the logits matmuls run single-pass on the MXU (an f32 dot_general
    decomposes into multiple bf16 passes). All accumulation stays f32
    (preferred_element_type), the statistics/log-likelihood math is
    f32, and the cast happens INSIDE the custom-VJP boundary so the
    returned cotangents are exact f32 — only the operand reads are
    rounded. With tpu.compute_dtype=bfloat16 the embeddings already
    carry bf16-level rounding out of the conv head, so this adds no
    meaningfully new noise (quantified in tests/test_pallas_loss.py and
    the synthetic A/B)."""
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _pad_to(x, multiple, axis, value=0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _compact_prototypes(valid_any, proto_arrays, own_idx):
    """Sort prototypes so every row the kernel can touch comes first.

    valid_any [P] bool: union of all validity tests the kernel applies
    plus the own-prototype rows of masked pixels. The losses are
    invariant under prototype permutation (own indices are remapped),
    so this changes nothing but which tiles the kernel may skip.

    Returns (sorted proto_arrays, remapped own_idx, valid count [1]).
    """
    p = valid_any.shape[0]
    order = jnp.argsort(jnp.where(valid_any, 0, 1).astype(jnp.int32),
                        stable=True)
    inv = jnp.zeros((p,), jnp.int32).at[order].set(
        jnp.arange(p, dtype=jnp.int32))
    sorted_arrays = [a[order] for a in proto_arrays]
    # inv[own_idx] as a one-hot matvec instead of a [N] random-access
    # gather (~0.9 ms/step at flagship scale — TPU gathers serialize;
    # the iota-compare one-hot fuses into an MXU matmul). f32 operands,
    # NOT bf16: inv holds indices up to P-1 (thousands), exact in f32
    # below 2^24 but not in bf16 beyond 256. One nonzero per row, so
    # the sum is the looked-up index itself.
    own = own_idx.astype(jnp.int32)
    onehot = (own[:, None] == jnp.arange(p, dtype=jnp.int32)[None, :])
    new_own = jnp.einsum("np,p->n", onehot.astype(jnp.float32),
                         inv.astype(jnp.float32),
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)
    count = jnp.sum(valid_any.astype(jnp.int32)).reshape(1)
    return sorted_arrays, new_own, count


def _own_flag(own_idx, pixel_mask, p):
    """[P] bool: prototype is the own-prototype of some masked pixel
    (its own-similarity enters that pixel's statistics even when the
    prototype fails the kernel's validity tests).

    Computed as a one-hot matvec (counts > 0) rather than a scatter-max:
    XLA fuses the iota-compare one-hot into the matmul operand (the same
    mechanism the k-means one-hot matmuls rely on, ops/kmeans.py), so it
    rides the MXU instead of a 1.2 ms/step random-access scatter. f32
    accumulation of {0,1} is exact below 2^24 pixels, and the flag only
    tests count > 0."""
    onehot = (own_idx.astype(jnp.int32)[:, None]
              == jnp.arange(p, dtype=jnp.int32)[None, :])
    counts = jnp.einsum("np,n->p", onehot.astype(jnp.bfloat16),
                        pixel_mask.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return counts > 0


def _stats_kernel(kappa, nv_ref, emb_ref, pix_lab_ref, own_ref, protos_ref,
                  proto_lab_ref, own_out, same_out, diff_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        own_out[...] = jnp.zeros_like(own_out)
        same_out[...] = jnp.zeros_like(same_out)
        diff_out[...] = jnp.zeros_like(diff_out)

    # prototypes are compacted valid-first; tiles wholly past the valid
    # count contribute exactly zero to every statistic
    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims = jnp.exp(logits * kappa)  # [BLOCK_N, BLOCK_P]

        pix_lab = pix_lab_ref[0, :]      # [BLOCK_N]
        proto_lab = proto_lab_ref[0, :]  # [BLOCK_P]
        valid = (proto_lab >= 0)[None, :]
        same = (pix_lab[:, None] == proto_lab[None, :]) & valid
        diff = (pix_lab[:, None] != proto_lab[None, :]) & valid

        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        col = col + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        own_out[0, :] += jnp.sum(jnp.where(own_mask, sims, 0.0), axis=1)
        same_out[0, :] += jnp.sum(jnp.where(same, sims, 0.0), axis=1)
        diff_out[0, :] += jnp.sum(jnp.where(diff, sims, 0.0), axis=1)


def _stats_fwd_call(emb, pix_lab, own_idx, protos, proto_lab, num_valid,
                    kappa, interpret, operand_dtype="float32"):
    n, d = emb.shape
    p = protos.shape[0]
    dt = _op_dtype(operand_dtype)
    emb = emb.astype(dt)
    protos = protos.astype(dt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BLOCK_N, p // BLOCK_P),
        in_specs=[
            pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
            pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
            pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
            pl.BlockSpec((BLOCK_P, d), lambda i, j, nv: (j, 0)),
            pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
            pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
            pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((1, n), jnp.float32)] * 3
    kernel = functools.partial(_stats_kernel, kappa)
    own, same, diff = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(num_valid, emb, pix_lab[None], own_idx[None], protos, proto_lab[None])
    return own[0], same[0], diff[0]


def _grad_coeff_kernel(kappa, nv_ref, emb_ref, pix_lab_ref, own_ref,
                       g_own_ref, g_same_ref, g_diff_ref, protos_ref,
                       proto_lab_ref, de_out):
    """dE accumulation: dE[n] += sum_k c[n,k] * P[k],
    c = kappa * sims * (g_own * own_mask + g_same * same + g_diff * diff).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        de_out[...] = jnp.zeros_like(de_out)

    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims = jnp.exp(logits * kappa)

        pix_lab = pix_lab_ref[0, :]
        proto_lab = proto_lab_ref[0, :]
        valid = (proto_lab >= 0)[None, :]
        same = (pix_lab[:, None] == proto_lab[None, :]) & valid
        diff = (pix_lab[:, None] != proto_lab[None, :]) & valid
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) \
            + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        g = (jnp.where(own_mask, g_own_ref[0, :][:, None], 0.0)
             + jnp.where(same, g_same_ref[0, :][:, None], 0.0)
             + jnp.where(diff, g_diff_ref[0, :][:, None], 0.0))
        # cast to the operand dtype (no-op in f32 mode) so the matmul
        # is single-pass MXU under bf16 operands; accumulation stays f32
        c = (kappa * sims * g).astype(protos_ref.dtype)
        de_out[...] += jax.lax.dot_general(
            c, protos_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _grad_proto_kernel(kappa, nv_ref, emb_ref, pix_lab_ref, own_ref,
                       g_own_ref, g_same_ref, g_diff_ref, protos_ref,
                       proto_lab_ref, dp_out):
    """dP accumulation: dP[k] += sum_n c[n,k] * E[n] (inner grid over N)."""
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dp_out[...] = jnp.zeros_like(dp_out)

    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims = jnp.exp(logits * kappa)

        pix_lab = pix_lab_ref[0, :]
        proto_lab = proto_lab_ref[0, :]
        valid = (proto_lab >= 0)[None, :]
        same = (pix_lab[:, None] == proto_lab[None, :]) & valid
        diff = (pix_lab[:, None] != proto_lab[None, :]) & valid
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) \
            + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        g = (jnp.where(own_mask, g_own_ref[0, :][:, None], 0.0)
             + jnp.where(same, g_same_ref[0, :][:, None], 0.0)
             + jnp.where(diff, g_diff_ref[0, :][:, None], 0.0))
        # [BLOCK_N, BLOCK_P]; operand-dtype cast as in _grad_coeff_kernel
        c = (kappa * sims * g).astype(emb_ref.dtype)
        dp_out[...] += jax.lax.dot_general(
            c, emb_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def segsort_stats(emb, pix_lab, own_idx, protos, proto_lab, num_valid,
                  kappa, interpret=False, operand_dtype="float32"):
    """(own, same_sum, diff_sum) per pixel, all [N] float32.

    Args:
      emb: [N, D] L2-normalized pixels (N % 256 == 0 after caller pad).
      pix_lab: [N] int32 pixel class labels.
      own_idx: [N] int32 own-prototype row index.
      protos: [P, D] prototypes (P % 512 == 0 after caller pad).
      proto_lab: [P] int32 prototype labels; NEGATIVE = invalid
        (excluded from same/diff sums).
      num_valid: [1] int32 — prototypes must be sorted so that every row
        with proto_lab >= 0 (plus every masked pixel's own row) sits
        below this count; tiles past it are skipped.
      kappa: python float concentration.
    """
    return _stats_fwd_call(emb, pix_lab, own_idx, protos, proto_lab,
                           num_valid, kappa, interpret, operand_dtype)


def _stats_fwd(emb, pix_lab, own_idx, protos, proto_lab, num_valid, kappa,
               interpret, operand_dtype):
    out = _stats_fwd_call(emb, pix_lab, own_idx, protos, proto_lab,
                          num_valid, kappa, interpret, operand_dtype)
    return out, (emb, pix_lab, own_idx, protos, proto_lab, num_valid)


def _stats_bwd(kappa, interpret, operand_dtype, residuals, grads):
    emb, pix_lab, own_idx, protos, proto_lab, num_valid = residuals
    g_own, g_same, g_diff = grads
    n, d = emb.shape
    p = protos.shape[0]
    dt = _op_dtype(operand_dtype)
    emb = emb.astype(dt)
    protos = protos.astype(dt)

    de = pl.pallas_call(
        functools.partial(_grad_coeff_kernel, kappa),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // BLOCK_N, p // BLOCK_P),
            in_specs=[
                pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((BLOCK_P, d), lambda i, j, nv: (j, 0)),
                pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
            ],
            out_specs=pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(num_valid, emb, pix_lab[None], own_idx[None], g_own[None],
      g_same[None], g_diff[None], protos, proto_lab[None])

    dp = pl.pallas_call(
        functools.partial(_grad_proto_kernel, kappa),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p // BLOCK_P, n // BLOCK_N),
            in_specs=[
                pl.BlockSpec((BLOCK_N, d), lambda j, i, nv: (i, 0)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((BLOCK_P, d), lambda j, i, nv: (j, 0)),
                pl.BlockSpec((1, BLOCK_P), lambda j, i, nv: (0, j)),
            ],
            out_specs=pl.BlockSpec((BLOCK_P, d), lambda j, i, nv: (j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((p, d), jnp.float32),
        interpret=interpret,
    )(num_valid, emb, pix_lab[None], own_idx[None], g_own[None],
      g_same[None], g_diff[None], protos, proto_lab[None])

    return de, None, None, dp, None, None


segsort_stats.defvjp(_stats_fwd, _stats_bwd)


def fused_segsort_loss(embeddings, semantic_labels, own_segment_ids,
                       prototypes, prototype_semantic_labels, concentration,
                       pixel_mask, prototype_mask, interpret=False,
                       reduction="mean", compact=True,
                       operand_dtype="float32"):
    """Drop-in replacement for spml_tpu.ops.losses.segsort_loss backed by
    the fused kernel. Pads N to 256 and P to 512 internally; padded
    pixels/prototypes are masked out exactly (invalid label -1).
    compact=True sorts prototypes valid-first so the kernel can skip
    fully-invalid tiles (exact; see module docstring).
    reduction="none" returns the per-pixel [N] log-likelihoods."""
    n0 = embeddings.shape[0]
    p0 = prototypes.shape[0]
    protos = prototypes.astype(jnp.float32)
    plab = jnp.where(prototype_mask,
                     prototype_semantic_labels.astype(jnp.int32), -1)
    own = own_segment_ids.astype(jnp.int32)

    if compact:
        touch = (plab >= 0) | _own_flag(own, pixel_mask, p0)
        (protos, plab), own, num_valid = _compact_prototypes(
            touch, [protos, plab], own)
    else:
        num_valid = jnp.full((1,), p0, jnp.int32)

    emb = _pad_to(embeddings.astype(jnp.float32), BLOCK_N, 0)
    pix_lab = _pad_to(semantic_labels.astype(jnp.int32), BLOCK_N, 0,
                      value=-1)
    own = _pad_to(own, BLOCK_N, 0, value=0)
    protos = _pad_to(protos, BLOCK_P, 0)
    plab = _pad_to(plab, BLOCK_P, 0, value=-1)

    own_s, same_s, diff_s = segsort_stats(emb, pix_lab, own, protos, plab,
                                          num_valid, float(concentration),
                                          interpret, operand_dtype)
    own_s, same_s, diff_s = own_s[:n0], same_s[:n0], diff_s[:n0]
    return _ll_from_stats(own_s, same_s, diff_s, pixel_mask, reduction)


# ---------------------------------------------------------------------------
# Set (multi-hot tag) variant — SetSegSortLoss (reference loss.py:85-130)
# ---------------------------------------------------------------------------

def _set_stats_kernel(kappa, nv_ref, emb_ref, pix_tag_ref, own_ref,
                      protos_ref, proto_tag_ref, proto_valid_ref, own_out,
                      same_out, diff_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        own_out[...] = jnp.zeros_like(own_out)
        same_out[...] = jnp.zeros_like(same_out)
        diff_out[...] = jnp.zeros_like(diff_out)

    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims = jnp.exp(logits * kappa)

        affinity = jax.lax.dot_general(
            pix_tag_ref[...], proto_tag_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        valid = proto_valid_ref[0, :][None, :] > 0
        same = (affinity > 0) & valid
        diff = (affinity == 0) & valid

        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) \
            + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        own_out[0, :] += jnp.sum(jnp.where(own_mask, sims, 0.0), axis=1)
        same_out[0, :] += jnp.sum(jnp.where(same, sims, 0.0), axis=1)
        diff_out[0, :] += jnp.sum(jnp.where(diff, sims, 0.0), axis=1)


def _set_grad_kernel(kappa, transpose, nv_ref, emb_ref, pix_tag_ref,
                     own_ref, g_own_ref, g_same_ref, g_diff_ref, protos_ref,
                     proto_tag_ref, proto_valid_ref, out_ref):
    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if transpose:
        j = pl.program_id(0)
    else:
        j = inner

    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims = jnp.exp(logits * kappa)

        affinity = jax.lax.dot_general(
            pix_tag_ref[...], proto_tag_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        valid = proto_valid_ref[0, :][None, :] > 0
        same = (affinity > 0) & valid
        diff = (affinity == 0) & valid

        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) \
            + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        g = (jnp.where(own_mask, g_own_ref[0, :][:, None], 0.0)
             + jnp.where(same, g_same_ref[0, :][:, None], 0.0)
             + jnp.where(diff, g_diff_ref[0, :][:, None], 0.0))
        c = (kappa * sims * g).astype(emb_ref.dtype)
        if transpose:
            out_ref[...] += jax.lax.dot_general(
                c, emb_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            out_ref[...] += jax.lax.dot_general(
                c, protos_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _set_stats_fwd_call(emb, pix_tags, own_idx, protos, proto_tags,
                        proto_valid, num_valid, kappa, interpret,
                        operand_dtype="float32"):
    n, d = emb.shape
    p = protos.shape[0]
    t = pix_tags.shape[1]
    dt = _op_dtype(operand_dtype)
    # tags are 0/1 with intersection counts <= tag width (exact in bf16)
    emb, protos = emb.astype(dt), protos.astype(dt)
    pix_tags, proto_tags = pix_tags.astype(dt), proto_tags.astype(dt)
    kernel = functools.partial(_set_stats_kernel, kappa)
    own, same, diff = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // BLOCK_N, p // BLOCK_P),
            in_specs=[
                pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((BLOCK_N, t), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((BLOCK_P, d), lambda i, j, nv: (j, 0)),
                pl.BlockSpec((BLOCK_P, proto_tags.shape[1]),
                             lambda i, j, nv: (j, 0)),
                pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 3,
        interpret=interpret,
    )(num_valid, emb, pix_tags, own_idx[None], protos, proto_tags,
      proto_valid[None])
    return own[0], same[0], diff[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def set_segsort_stats(emb, pix_tags, own_idx, protos, proto_tags,
                      proto_valid, num_valid, kappa, interpret=False,
                      operand_dtype="float32"):
    """(own, same_sum, diff_sum) with multi-hot tag membership.

    pix_tags [N, T] / proto_tags [P, T] float32; same-class means the tag
    sets intersect; proto_valid [P] int32 gates both sums. num_valid [1]
    as in segsort_stats (sorted valid-first, tiles past it skipped).
    """
    return _set_stats_fwd_call(emb, pix_tags, own_idx, protos, proto_tags,
                               proto_valid, num_valid, kappa, interpret,
                               operand_dtype)


def _set_stats_fwd(emb, pix_tags, own_idx, protos, proto_tags, proto_valid,
                   num_valid, kappa, interpret, operand_dtype):
    out = _set_stats_fwd_call(emb, pix_tags, own_idx, protos, proto_tags,
                              proto_valid, num_valid, kappa, interpret,
                              operand_dtype)
    return out, (emb, pix_tags, own_idx, protos, proto_tags, proto_valid,
                 num_valid)


def _set_stats_bwd(kappa, interpret, operand_dtype, residuals, grads):
    (emb, pix_tags, own_idx, protos, proto_tags, proto_valid,
     num_valid) = residuals
    g_own, g_same, g_diff = grads
    n, d = emb.shape
    p = protos.shape[0]
    t = pix_tags.shape[1]
    dt = _op_dtype(operand_dtype)
    emb, protos = emb.astype(dt), protos.astype(dt)
    pix_tags, proto_tags = pix_tags.astype(dt), proto_tags.astype(dt)

    common_in = [
        num_valid, emb, pix_tags, own_idx[None], g_own[None], g_same[None],
        g_diff[None], protos, proto_tags, proto_valid[None]]

    de = pl.pallas_call(
        functools.partial(_set_grad_kernel, kappa, False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // BLOCK_N, p // BLOCK_P),
            in_specs=[
                pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((BLOCK_N, t), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((BLOCK_P, d), lambda i, j, nv: (j, 0)),
                pl.BlockSpec((BLOCK_P, t), lambda i, j, nv: (j, 0)),
                pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
            ],
            out_specs=pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(*common_in)

    dp = pl.pallas_call(
        functools.partial(_set_grad_kernel, kappa, True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p // BLOCK_P, n // BLOCK_N),
            in_specs=[
                pl.BlockSpec((BLOCK_N, d), lambda j, i, nv: (i, 0)),
                pl.BlockSpec((BLOCK_N, t), lambda j, i, nv: (i, 0)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda j, i, nv: (0, i)),
                pl.BlockSpec((BLOCK_P, d), lambda j, i, nv: (j, 0)),
                pl.BlockSpec((BLOCK_P, t), lambda j, i, nv: (j, 0)),
                pl.BlockSpec((1, BLOCK_P), lambda j, i, nv: (0, j)),
            ],
            out_specs=pl.BlockSpec((BLOCK_P, d), lambda j, i, nv: (j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((p, d), jnp.float32),
        interpret=interpret,
    )(*common_in)

    return de, None, None, dp, None, None, None


set_segsort_stats.defvjp(_set_stats_fwd, _set_stats_bwd)


def fused_set_segsort_loss(embeddings, semantic_tags, own_segment_ids,
                           prototypes, prototype_semantic_tags,
                           concentration, pixel_mask, prototype_mask,
                           interpret=False, reduction="mean", compact=True,
                           operand_dtype="float32"):
    """Drop-in replacement for spml_tpu.ops.losses.set_segsort_loss.
    reduction="none" returns the per-pixel [N] log-likelihoods."""
    n0 = embeddings.shape[0]
    p0 = prototypes.shape[0]
    protos = prototypes.astype(jnp.float32)
    qtags = _pad_to(prototype_semantic_tags.astype(jnp.float32), 128, 1)
    pvalid = prototype_mask.astype(jnp.int32)
    own = own_segment_ids.astype(jnp.int32)

    if compact:
        touch = (pvalid > 0) | _own_flag(own, pixel_mask, p0)
        (protos, qtags, pvalid), own, num_valid = _compact_prototypes(
            touch, [protos, qtags, pvalid], own)
    else:
        num_valid = jnp.full((1,), p0, jnp.int32)

    emb = _pad_to(embeddings.astype(jnp.float32), BLOCK_N, 0)
    # zero-pad the tag width to a lane-friendly 128 (doesn't change dots)
    ptags = _pad_to(_pad_to(semantic_tags.astype(jnp.float32), 128, 1),
                    BLOCK_N, 0)
    own = _pad_to(own, BLOCK_N, 0)
    protos = _pad_to(protos, BLOCK_P, 0)
    qtags = _pad_to(qtags, BLOCK_P, 0)
    pvalid = _pad_to(pvalid, BLOCK_P, 0)

    own_s, same_s, diff_s = set_segsort_stats(
        emb, ptags, own, protos, qtags, pvalid, num_valid,
        float(concentration), interpret, operand_dtype)
    own_s, same_s, diff_s = own_s[:n0], same_s[:n0], diff_s[:n0]
    return _ll_from_stats(own_s, same_s, diff_s, pixel_mask, reduction)


# ---------------------------------------------------------------------------
# Joint kernel: sem_ann (hard labels, kappa_a) + sem_occ (tags, kappa_o)
# share one logits matmul and one HBM sweep — the two losses always see
# the same embeddings/prototypes in the SPML step.
# ---------------------------------------------------------------------------

def _joint_stats_kernel(kappa_a, kappa_o, nv_ref, emb_ref, pix_lab_ref,
                        own_ref, pix_tag_ref, protos_ref, proto_lab_ref,
                        proto_tag_ref, proto_valid_ref,
                        own_a_out, same_a_out, diff_a_out,
                        own_o_out, same_o_out, diff_o_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for ref in (own_a_out, same_a_out, diff_a_out,
                    own_o_out, same_o_out, diff_o_out):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims_a = jnp.exp(logits * kappa_a)
        # kappa ratio 2 (the flagship scribble config: 6/12): one exp + a
        # square instead of two exps — exact to 1 ulp, and the exps are
        # the kernel's dominant VPU cost
        if kappa_o == 2.0 * kappa_a:
            sims_o = sims_a * sims_a
        else:
            sims_o = jnp.exp(logits * kappa_o)

        pix_lab = pix_lab_ref[0, :]
        proto_lab = proto_lab_ref[0, :]
        lab_valid = (proto_lab >= 0)[None, :]
        same_a = (pix_lab[:, None] == proto_lab[None, :]) & lab_valid
        diff_a = (pix_lab[:, None] != proto_lab[None, :]) & lab_valid

        # tag sets packed as int32 bitwords: intersection == bitwise AND
        inter = pix_tag_ref[0, :][:, None] & proto_tag_ref[0, :][None, :]
        tag_valid = proto_valid_ref[0, :][None, :] > 0
        same_o = (inter != 0) & tag_valid
        diff_o = (inter == 0) & tag_valid

        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) \
            + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        own_a_out[0, :] += jnp.sum(jnp.where(own_mask, sims_a, 0.0), axis=1)
        same_a_out[0, :] += jnp.sum(jnp.where(same_a, sims_a, 0.0), axis=1)
        diff_a_out[0, :] += jnp.sum(jnp.where(diff_a, sims_a, 0.0), axis=1)
        own_o_out[0, :] += jnp.sum(jnp.where(own_mask, sims_o, 0.0), axis=1)
        same_o_out[0, :] += jnp.sum(jnp.where(same_o, sims_o, 0.0), axis=1)
        diff_o_out[0, :] += jnp.sum(jnp.where(diff_o, sims_o, 0.0), axis=1)


def _joint_grad_kernel(kappa_a, kappa_o, transpose, nv_ref, emb_ref,
                       pix_lab_ref, own_ref, pix_tag_ref,
                       ga_own_ref, ga_same_ref, ga_diff_ref,
                       go_own_ref, go_same_ref, go_diff_ref,
                       protos_ref, proto_lab_ref, proto_tag_ref,
                       proto_valid_ref, out_ref):
    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if transpose:
        j = pl.program_id(0)
    else:
        j = inner

    @pl.when(j * BLOCK_P < nv_ref[0])
    def _():
        logits = jax.lax.dot_general(
            emb_ref[...], protos_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims_a = jnp.exp(logits * kappa_a)
        if kappa_o == 2.0 * kappa_a:  # see _joint_stats_kernel
            sims_o = sims_a * sims_a
        else:
            sims_o = jnp.exp(logits * kappa_o)

        pix_lab = pix_lab_ref[0, :]
        proto_lab = proto_lab_ref[0, :]
        lab_valid = (proto_lab >= 0)[None, :]
        same_a = (pix_lab[:, None] == proto_lab[None, :]) & lab_valid
        diff_a = (pix_lab[:, None] != proto_lab[None, :]) & lab_valid

        inter = pix_tag_ref[0, :][:, None] & proto_tag_ref[0, :][None, :]
        tag_valid = proto_valid_ref[0, :][None, :] > 0
        same_o = (inter != 0) & tag_valid
        diff_o = (inter == 0) & tag_valid

        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) \
            + j * BLOCK_P
        own_mask = col == own_ref[0, :][:, None]

        g_a = (jnp.where(own_mask, ga_own_ref[0, :][:, None], 0.0)
               + jnp.where(same_a, ga_same_ref[0, :][:, None], 0.0)
               + jnp.where(diff_a, ga_diff_ref[0, :][:, None], 0.0))
        g_o = (jnp.where(own_mask, go_own_ref[0, :][:, None], 0.0)
               + jnp.where(same_o, go_same_ref[0, :][:, None], 0.0)
               + jnp.where(diff_o, go_diff_ref[0, :][:, None], 0.0))
        c = (kappa_a * sims_a * g_a
             + kappa_o * sims_o * g_o).astype(emb_ref.dtype)
        if transpose:
            out_ref[...] += jax.lax.dot_general(
                c, emb_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            out_ref[...] += jax.lax.dot_general(
                c, protos_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _joint_in_specs(d, transpose):
    if transpose:
        def row(i_, j_, nv_): return (j_, 0)  # noqa: E704
        def vec(i_, j_, nv_): return (0, j_)  # noqa: E704
        def prow(i_, j_, nv_): return (i_, 0)  # noqa: E704
        def pvec(i_, j_, nv_): return (0, i_)  # noqa: E704
    else:
        def row(i_, j_, nv_): return (i_, 0)  # noqa: E704
        def vec(i_, j_, nv_): return (0, i_)  # noqa: E704
        def prow(i_, j_, nv_): return (j_, 0)  # noqa: E704
        def pvec(i_, j_, nv_): return (0, j_)  # noqa: E704
    return [
        pl.BlockSpec((BLOCK_N, d), row),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),   # pix tag bitwords
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((1, BLOCK_N), vec),
        pl.BlockSpec((BLOCK_P, d), prow),
        pl.BlockSpec((1, BLOCK_P), pvec),
        pl.BlockSpec((1, BLOCK_P), pvec),  # proto tag bitwords
        pl.BlockSpec((1, BLOCK_P), pvec),
    ]


def _joint_fwd_call(emb, pix_lab, own_idx, pix_tags, protos, proto_lab,
                    proto_tags, proto_valid, num_valid, kappa_a, kappa_o,
                    interpret, operand_dtype="float32"):
    n, d = emb.shape
    p = protos.shape[0]
    dt = _op_dtype(operand_dtype)
    emb, protos = emb.astype(dt), protos.astype(dt)
    outs = pl.pallas_call(
        functools.partial(_joint_stats_kernel, kappa_a, kappa_o),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // BLOCK_N, p // BLOCK_P),
            in_specs=[
                pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((1, BLOCK_N), lambda i, j, nv: (0, i)),
                pl.BlockSpec((BLOCK_P, d), lambda i, j, nv: (j, 0)),
                pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
                pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
                pl.BlockSpec((1, BLOCK_P), lambda i, j, nv: (0, j)),
            ],
            out_specs=[pl.BlockSpec((1, BLOCK_N),
                                    lambda i, j, nv: (0, i))] * 6,
        ),
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 6,
        interpret=interpret,
    )(num_valid, emb, pix_lab[None], own_idx[None], pix_tags[None], protos,
      proto_lab[None], proto_tags[None], proto_valid[None])
    return tuple(o[0] for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def joint_segsort_stats(emb, pix_lab, own_idx, pix_tags, protos,
                        proto_lab, proto_tags, proto_valid, num_valid,
                        kappa_a, kappa_o, interpret=False,
                        operand_dtype="float32"):
    """Six stats in one sweep: (own_a, same_a, diff_a) for the hard-label
    loss at kappa_a and (own_o, same_o, diff_o) for the tag loss at
    kappa_o.

    pix_tags / proto_tags are [N] / [P] int32 BITWORDS (bit c set = class
    c in the tag set; <= 32 classes), so tag intersection is a bitwise
    AND instead of a lane-padded matmul. num_valid [1] as in
    segsort_stats (prototypes sorted valid-first; tiles past it skipped).
    """
    return _joint_fwd_call(emb, pix_lab, own_idx, pix_tags, protos,
                           proto_lab, proto_tags, proto_valid, num_valid,
                           kappa_a, kappa_o, interpret, operand_dtype)


def _joint_fwd(emb, pix_lab, own_idx, pix_tags, protos, proto_lab,
               proto_tags, proto_valid, num_valid, kappa_a, kappa_o,
               interpret, operand_dtype):
    out = _joint_fwd_call(emb, pix_lab, own_idx, pix_tags, protos,
                          proto_lab, proto_tags, proto_valid, num_valid,
                          kappa_a, kappa_o, interpret, operand_dtype)
    return out, (emb, pix_lab, own_idx, pix_tags, protos, proto_lab,
                 proto_tags, proto_valid, num_valid)


def _joint_bwd(kappa_a, kappa_o, interpret, operand_dtype, residuals,
               grads):
    (emb, pix_lab, own_idx, pix_tags, protos, proto_lab, proto_tags,
     proto_valid, num_valid) = residuals
    ga_own, ga_same, ga_diff, go_own, go_same, go_diff = grads
    n, d = emb.shape
    p = protos.shape[0]
    dt = _op_dtype(operand_dtype)
    emb, protos = emb.astype(dt), protos.astype(dt)

    ins = [num_valid, emb, pix_lab[None], own_idx[None], pix_tags[None],
           ga_own[None], ga_same[None], ga_diff[None],
           go_own[None], go_same[None], go_diff[None],
           protos, proto_lab[None], proto_tags[None], proto_valid[None]]

    de = pl.pallas_call(
        functools.partial(_joint_grad_kernel, kappa_a, kappa_o, False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // BLOCK_N, p // BLOCK_P),
            in_specs=_joint_in_specs(d, False),
            out_specs=pl.BlockSpec((BLOCK_N, d), lambda i, j, nv: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(*ins)

    dp = pl.pallas_call(
        functools.partial(_joint_grad_kernel, kappa_a, kappa_o, True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p // BLOCK_P, n // BLOCK_N),
            in_specs=_joint_in_specs(d, True),
            out_specs=pl.BlockSpec((BLOCK_P, d), lambda j, i, nv: (j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((p, d), jnp.float32),
        interpret=interpret,
    )(*ins)

    return de, None, None, None, dp, None, None, None, None


joint_segsort_stats.defvjp(_joint_fwd, _joint_bwd)


def _ll_from_stats(own_s, same_s, diff_s, pixel_mask, reduction="mean"):
    same_minus = same_s - own_s
    numerator = jnp.where(same_minus > 0, same_minus, own_s)
    # Pixels outside the mask can have all-zero statistics when their own
    # prototype sits past the compaction count; the tiny floor keeps
    # their (discarded) log finite instead of NaN-poisoning masked means.
    # In-mask pixels have own >= exp(-kappa) >> 1e-30, so it's inert.
    numerator = jnp.maximum(numerator, 1e-30)
    denominator = diff_s + numerator
    ll = -jnp.log(numerator / denominator)
    if reduction == "none":
        return ll
    m = pixel_mask.astype(jnp.float32)
    return jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def _pack_tag_bits(tags):
    """[N, T] 0/1 tags -> [N] int32 bitwords (requires T <= 32)."""
    t = tags.shape[1]
    assert t <= 32, f"tag width {t} exceeds the 32-bit packing"
    weights = (2 ** jnp.arange(t, dtype=jnp.int32))
    return jnp.sum(tags.astype(jnp.int32) * weights[None, :], axis=1)


def fused_joint_losses(embeddings, semantic_labels, own_segment_ids,
                       semantic_tags, prototypes, prototype_labels,
                       prototype_tags, kappa_ann, kappa_occ,
                       ann_pixel_mask, occ_pixel_mask, prototype_mask,
                       interpret=False, reduction="mean", compact=True,
                       operand_dtype="float32"):
    """(sem_ann, sem_occ) masked-mean losses in one fused sweep
    (or per-pixel [N] log-likelihood pairs with reduction="none").

    prototype_labels must already be -1 for prototypes excluded from the
    hard-label loss; prototype_mask gates the tag loss. Tag sets are
    packed to int32 bitwords inside (<= 32 tag classes).
    """
    n0 = embeddings.shape[0]
    p0 = prototypes.shape[0]
    protos = prototypes.astype(jnp.float32)
    plab = prototype_labels.astype(jnp.int32)
    qtags = _pack_tag_bits(prototype_tags)
    pvalid = prototype_mask.astype(jnp.int32)
    own = own_segment_ids.astype(jnp.int32)

    if compact:
        touch = ((plab >= 0) | (pvalid > 0)
                 | _own_flag(own, ann_pixel_mask | occ_pixel_mask, p0))
        (protos, plab, qtags, pvalid), own, num_valid = \
            _compact_prototypes(touch, [protos, plab, qtags, pvalid], own)
    else:
        num_valid = jnp.full((1,), p0, jnp.int32)

    emb = _pad_to(embeddings.astype(jnp.float32), BLOCK_N, 0)
    lab = _pad_to(semantic_labels.astype(jnp.int32), BLOCK_N, 0, value=-1)
    own = _pad_to(own, BLOCK_N, 0)
    ptags = _pad_to(_pack_tag_bits(semantic_tags), BLOCK_N, 0)
    protos = _pad_to(protos, BLOCK_P, 0)
    plab = _pad_to(plab, BLOCK_P, 0, value=-1)
    qtags = _pad_to(qtags, BLOCK_P, 0)
    pvalid = _pad_to(pvalid, BLOCK_P, 0)

    stats = joint_segsort_stats(emb, lab, own, ptags, protos, plab, qtags,
                                pvalid, num_valid, float(kappa_ann),
                                float(kappa_occ), interpret, operand_dtype)
    own_a, same_a, diff_a, own_o, same_o, diff_o = [s[:n0] for s in stats]
    ann = _ll_from_stats(own_a, same_a, diff_a, ann_pixel_mask, reduction)
    occ = _ll_from_stats(own_o, same_o, diff_o, occ_pixel_mask, reduction)
    return ann, occ
