"""Embedding-affinity random walk for pseudo-label propagation.

Behavioral reference: pyscripts/inference/pseudo_camrw_crf.py:139-170 (and
pseudo_softmaxrw_crf.py:146-164, pseudo_softmax.py:184-192) in twke18/SPML:
* pixel affinity at a stride-8 grid: A = exp(5 * cos(e_i, e_j) - 5);
* transition T = column-normalize(A^beta), beta=20;
* walk: T <- T @ T, `walk_steps` times (i.e. T^(2^steps));
* scores' = scores @ T.

These are dense [n, n] matmuls (n ~ 4k for a 512px image) — exactly what
the MXU is for; the whole walk jit-compiles into one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spml_tpu.ops import common


@functools.partial(jax.jit, static_argnames=("beta", "walk_steps"))
def random_walk(embeddings: jnp.ndarray, scores: jnp.ndarray,
                beta: int = 20, walk_steps: int = 6) -> jnp.ndarray:
    """Args:
      embeddings: [n, d] L2-normalized grid embeddings.
      scores: [C, n] class score vectors to propagate.
    Returns: [C, n] propagated scores.
    """
    aff = jnp.exp(
        jnp.einsum("nd,md->nm", embeddings, embeddings,
                   preferred_element_type=jnp.float32) * 5.0 - 5.0)
    aff = aff ** beta
    trans = aff / jnp.sum(aff, axis=0, keepdims=True)

    def square(t, _):
        return t @ t, None

    trans, _ = jax.lax.scan(square, trans, None, length=walk_steps)
    return scores @ trans


def cam_to_full_scores(cam_dict: dict, num_classes: int, height: int,
                       width: int, bg_alpha: float = 6.0):
    """Assemble per-class CAM scores with the power background prior
    (pseudo_camrw_crf.py:103-112): bg = (1 - max_fg)^alpha; CAM class k
    maps to semantic class k+1."""
    import numpy as np
    full = np.zeros((num_classes, height, width), np.float32)
    for k, v in cam_dict.items():
        full[int(k) + 1] = v
    full[0] = np.power(1.0 - np.max(full[1:], axis=0), bg_alpha)
    return full


@functools.partial(jax.jit, static_argnames=("beta", "walk_steps"))
def random_walk_from_affinity(aff: jnp.ndarray, scores: jnp.ndarray,
                              beta: int = 20,
                              walk_steps: int = 6) -> jnp.ndarray:
    """Same walk, but over a precomputed (e.g. flip-averaged) affinity
    matrix — the reference averages the per-flip affinities before the
    walk (pseudo_camrw_crf.py:151-163)."""
    aff = aff ** beta
    trans = aff / jnp.sum(aff, axis=0, keepdims=True)

    def square(t, _):
        return t @ t, None

    trans, _ = jax.lax.scan(square, trans, None, length=walk_steps)
    return scores @ trans


def pixel_affinity(embeddings: jnp.ndarray) -> jnp.ndarray:
    """exp(5 cos - 5) pairwise affinity of [n, d] normalized rows."""
    return jnp.exp(
        jnp.einsum("nd,md->nm", embeddings, embeddings,
                   preferred_element_type=jnp.float32) * 5.0 - 5.0)
