"""host_init (jitted CPU-backend flax init) is exact.

Locks the claims in spml_tpu/models/embeddings.py::host_init:
(1) init values depend only on parameter shapes, never on the sample's
spatial size (bitwise), and (2) jitted init == eager init on the same
backend up to 1 ulp (XLA fuses the RNG->normal transform under jit,
which rounds a handful of conv-kernel leaves differently by <=6e-8 —
immaterial for random init draws). Together these make the
small-sample host init a pure startup optimization (it replaced a
measured ~200 s/stage eager init over the TPU tunnel,
STARTUP_PROBE.json).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.models.embeddings import (ClassifierHead,
                                        build_embedding_model, host_init)


def _assert_trees_equal(a, b, atol=0.0):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        x = np.asarray(x)
        y = np.asarray(y)
        assert x.dtype == y.dtype
        assert x.shape == y.shape
        if atol:
            np.testing.assert_allclose(x, y, rtol=0, atol=atol)
        else:
            np.testing.assert_array_equal(x, y)


def test_host_init_matches_eager_and_is_spatial_size_free():
    m = build_embedding_model("panoptic_deeplab_10", 16)
    key = jax.random.PRNGKey(7)
    eager = m.init(key, jnp.zeros((1, 64, 64, 3)), train=False)
    small = host_init(m, key, np.zeros((1, 96, 96, 3), np.float32))
    other = host_init(m, key, np.zeros((1, 64, 64, 3), np.float32))
    # spatial-size independence is bitwise; jit-vs-eager is 1-ulp
    _assert_trees_equal(small, other)
    _assert_trees_equal(eager, small, atol=1e-6)


def test_host_init_pspp_head():
    # PSPP's 6-bin adaptive pool is the tightest spatial constraint;
    # 96/8 = 12 bins available >= 6.
    m = build_embedding_model("panoptic_pspnet_101", 8)
    key = jax.random.PRNGKey(0)
    a = host_init(m, key, np.zeros((1, 96, 96, 3), np.float32))
    b = host_init(m, key, np.zeros((1, 128, 96, 3), np.float32))
    _assert_trees_equal(a, b)


def test_host_init_classifier_head():
    m = ClassifierHead(num_classes=5, hidden_dim=8)
    key = jax.random.PRNGKey(3)
    eager = m.init(key, jnp.zeros((1, 16, 16, 4)), train=False)
    hosted = host_init(m, key, np.zeros((1, 24, 24, 4), np.float32))
    _assert_trees_equal(eager, hosted, atol=1e-6)


def test_host_resize_pred_matches_device():
    # runner._resize_pred_to (host numpy) == ops.common.resize_labels
    # (device) for every pred/original shape combination.
    from spml_tpu.inference.runner import _resize_pred_to
    from spml_tpu.ops import common
    rng = np.random.RandomState(0)
    # dense sweep incl. commensurate pairs (gcd > 1, products exactly on
    # integers): the host index math must be float32 like the device's,
    # or adjacent-row floors diverge (advisor round-3 finding)
    shape_pairs = [((128, 128), (375, 500)),
                   ((96, 128), (500, 333)),
                   ((64, 64), (41, 77)),
                   ((32, 48), (32, 48)),
                   ((96, 96), (480, 480)),     # 5x exact
                   ((128, 128), (512, 512)),   # 4x exact
                   ((96, 64), (288, 512)),     # 3x / 8x exact
                   ((128, 96), (384, 160)),    # 3x / commensurate 96->160
                   ((100, 100), (250, 750)),   # 2.5x / 7.5x
                   ((48, 48), (60, 84))]       # 1.25x / 1.75x
    shape_pairs += [((rng.randint(16, 129), rng.randint(16, 129)),
                     (rng.randint(30, 520), rng.randint(30, 520)))
                    for _ in range(20)]
    for (ph, pw), (oh, ow) in shape_pairs:
        pred = rng.randint(0, 21, (ph, pw)).astype(np.int32)
        host = _resize_pred_to(pred, oh, ow)
        dev = np.asarray(common.resize_labels(jnp.asarray(pred[None]),
                                              (oh, ow)))[0]
        np.testing.assert_array_equal(host, dev, err_msg=f"{(ph,pw,oh,ow)}")
        assert host.dtype == pred.dtype
