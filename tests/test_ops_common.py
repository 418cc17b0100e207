import numpy as np
import jax.numpy as jnp

from spml_tpu.ops import common
from tests import oracles


def test_normalize_matches_oracle_and_handles_zero():
    rng = np.random.RandomState(0)
    x = rng.randn(17, 8).astype(np.float32)
    x[3] = 0.0
    got = np.asarray(common.normalize_embedding(jnp.asarray(x)))
    want = oracles.normalize(x)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert np.all(got[3] == 0.0)


def test_one_hot_out_of_range_is_zero():
    oh = np.asarray(common.one_hot(jnp.asarray([0, 2, 5, -1]), 4))
    assert oh.shape == (4, 4)
    np.testing.assert_array_equal(oh[2], 0)
    np.testing.assert_array_equal(oh[3], 0)
    assert oh[0, 0] == 1 and oh[1, 2] == 1


def test_segment_mean_matches_manual():
    x = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], np.float32)
    ids = np.array([0, 0, 2, 2])
    got = np.asarray(common.segment_mean(jnp.asarray(x), jnp.asarray(ids), 3))
    np.testing.assert_allclose(got[0], [2.0, 3.0])
    np.testing.assert_allclose(got[1], [0.0, 0.0])  # empty segment
    np.testing.assert_allclose(got[2], [6.0, 7.0])


def test_segment_mean_weights_mask_pixels():
    x = np.array([[1.0], [100.0], [3.0]], np.float32)
    ids = np.array([0, 0, 0])
    w = np.array([1.0, 0.0, 1.0], np.float32)
    got = np.asarray(common.segment_mean(jnp.asarray(x), jnp.asarray(ids), 1,
                                         jnp.asarray(w)))
    np.testing.assert_allclose(got[0], [2.0])


def test_resize_labels_matches_torch_nearest():
    # torch F.interpolate(nearest) picks src = floor(dst * in/out)
    labels = np.arange(6 * 8).reshape(1, 6, 8).astype(np.int32)
    got = np.asarray(common.resize_labels(jnp.asarray(labels), (3, 4)))
    ys = np.floor(np.arange(3) * 6 / 3).astype(int)
    xs = np.floor(np.arange(4) * 8 / 4).astype(int)
    want = labels[:, ys][:, :, xs]
    np.testing.assert_array_equal(got, want)
    # upsampling
    got_up = np.asarray(common.resize_labels(jnp.asarray(labels), (12, 16)))
    ys = np.floor(np.arange(12) * 6 / 12).astype(int)
    xs = np.floor(np.arange(16) * 8 / 16).astype(int)
    np.testing.assert_array_equal(got_up, labels[:, ys][:, :, xs])


def test_location_features_range():
    loc = np.asarray(common.generate_location_features(5, 9))
    assert loc.shape == (5, 9, 2)
    assert loc[0, 0, 0] == 0.0 and loc[-1, 0, 0] == 1.0
    assert loc[0, 0, 1] == 0.0 and loc[0, -1, 1] == 1.0
