import numpy as np
import jax.numpy as jnp
import pytest

from spml_tpu.ops import randomwalk


def test_random_walk_uniform_affinity_mixes():
    """With identical embeddings (affinity 1 everywhere), the walk
    converges to each class's mean score at every pixel."""
    n, c = 16, 3
    emb = np.ones((n, 1), np.float32)
    scores = np.zeros((c, n), np.float32)
    scores[0, :8] = 1.0
    scores[1, 8:] = 1.0
    out = np.asarray(randomwalk.random_walk(
        jnp.asarray(emb), jnp.asarray(scores), beta=1, walk_steps=1))
    np.testing.assert_allclose(out[0], 0.5, atol=1e-5)
    np.testing.assert_allclose(out[1], 0.5, atol=1e-5)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-5)


def test_random_walk_preserves_two_clusters():
    """Two orthogonal embedding groups don't exchange mass."""
    rng = np.random.RandomState(0)
    n = 8
    emb = np.zeros((n, 2), np.float32)
    emb[:4, 0] = 1.0
    emb[4:, 1] = 1.0
    scores = np.zeros((2, n), np.float32)
    scores[0, :4] = 1.0
    scores[1, 4:] = 1.0
    out = np.asarray(randomwalk.random_walk(
        jnp.asarray(emb), jnp.asarray(scores), beta=20, walk_steps=6))
    # cross-cluster affinity exp(-5)^20 ~ 4e-44 -> no leakage
    np.testing.assert_allclose(out[0, :4], 1.0, atol=1e-4)
    np.testing.assert_allclose(out[0, 4:], 0.0, atol=1e-4)
    np.testing.assert_allclose(out[1, 4:], 1.0, atol=1e-4)


def test_random_walk_matches_numpy_power():
    """T^(2^steps) equals the numpy matrix power of the same transition."""
    rng = np.random.RandomState(1)
    n, c = 12, 2
    emb = rng.randn(n, 4).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    scores = rng.rand(c, n).astype(np.float32)
    out = np.asarray(randomwalk.random_walk(
        jnp.asarray(emb), jnp.asarray(scores), beta=3, walk_steps=3))
    aff = np.exp(5.0 * emb @ emb.T - 5.0) ** 3
    trans = aff / aff.sum(0, keepdims=True)
    want = scores @ np.linalg.matrix_power(trans.astype(np.float64), 8)
    np.testing.assert_allclose(out, want, rtol=2e-3, atol=1e-5)


def test_cam_to_full_scores_background_prior():
    cam = {0: np.full((4, 4), 0.8, np.float32)}
    full = randomwalk.cam_to_full_scores(cam, 3, 4, 4, bg_alpha=6.0)
    assert full.shape == (3, 4, 4)
    np.testing.assert_allclose(full[1], 0.8)
    np.testing.assert_allclose(full[0], (1 - 0.8) ** 6, rtol=1e-6)
    np.testing.assert_allclose(full[2], 0.0)


def test_densecrf_denoises_and_preserves():
    from spml_tpu.crf import DenseCRF
    rng = np.random.RandomState(0)
    H, W, C = 48, 64, 4
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :32] = [200, 30, 30]
    img[:, 32:] = [30, 30, 200]
    probs = np.full((C, H, W), 0.1, np.float32)
    probs[1, :, :32] = 0.5
    probs[2, :, 32:] = 0.5
    mask = rng.rand(H, W) < 0.25
    wrong = rng.randint(0, C, (H, W))
    for c in range(C):
        probs[c, mask & (wrong == c)] = 0.9
    probs /= probs.sum(0, keepdims=True)
    gt = np.broadcast_to(
        np.where(np.arange(W)[None, :] < 32, 1, 2), (H, W))

    crf = DenseCRF(iter_max=10, pos_w=3, pos_xy_std=3, bi_w=4,
                   bi_xy_std=40, bi_rgb_std=5)
    out = crf(img, probs)
    assert out.shape == (C, H, W)
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)
    before = (probs.argmax(0) == gt).mean()
    after = (out.argmax(0) == gt).mean()
    assert after > before
    assert after > 0.97

    # uniform input is a fixed point (no unary preference, symmetric
    # smoothing preserves uniformity)
    uni = np.full((C, H, W), 1.0 / C, np.float32)
    out_u = crf(img, uni)
    np.testing.assert_allclose(out_u, 1.0 / C, atol=1e-3)


def test_densecrf_threaded_matches_serial():
    """The Gaussian lattice is LRU-cached and SHARED across same-sized
    images (native/densecrf/densecrf.cc::GaussianKernelCached) while the
    inference runner's _AsyncSink pool runs CRF tails concurrently.
    Filtering through a shared lattice must be race-free (per-model
    scratch): N threads over same-size inputs must reproduce the serial
    outputs bitwise."""
    import concurrent.futures as cf

    from spml_tpu.crf import DenseCRF

    rng = np.random.RandomState(1)
    H, W, C = 40, 56, 5
    crf = DenseCRF(iter_max=5, pos_w=3, pos_xy_std=3, bi_w=4,
                   bi_xy_std=30, bi_rgb_std=5)
    cases = []
    for _ in range(6):
        img = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
        probs = rng.dirichlet(np.ones(C), (H, W)).transpose(2, 0, 1)
        cases.append((img, np.ascontiguousarray(probs, np.float32)))

    serial = [crf(img, p) for img, p in cases]
    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        threaded = list(pool.map(lambda a: crf(*a), cases))
    for s, t in zip(serial, threaded):
        np.testing.assert_array_equal(s, t)
