"""Inference compile-latency control: padded shapes bucket to
crop + k*stride, warmup() precompiles every reachable bucket, and
serving distinct image shapes afterwards triggers NO new compilation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spml_tpu.config import load_config
from spml_tpu.inference import engine as engine_lib


@pytest.fixture
def eng():
    cfg = load_config(overrides={
        "dataset": {"num_classes": 4},
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_iterations": 2,
                    "kmeans_num_clusters": [2, 2]},
        "test": {"image_size": 64, "crop_size": [32, 32],
                 "stride": [16, 16]},
        "tpu": {"compute_dtype": "float32"},
    })
    from spml_tpu.models.embeddings import build_embedding_model
    model = build_embedding_model("panoptic_deeplab_10", 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return engine_lib.InferenceEngine(cfg, model, variables)


def test_bucket_rounding(eng):
    # crop 32, stride 16: sizes bucket to 32, 48, 64, ...
    assert eng.bucket_shape(20, 32) == (32, 32)
    assert eng.bucket_shape(33, 40) == (48, 48)
    assert eng.bucket_shape(48, 49) == (48, 64)
    assert eng.bucket_shape(64, 31) == (64, 32)


def test_three_shapes_one_bucket_no_recompile(eng):
    cfg = eng.config
    memory = (jnp.zeros((30, 8), jnp.float32),
              jnp.zeros((30,), jnp.int32), jnp.ones((30,), bool))
    warmed = eng.warmup(memory=memory)
    # image_size 64, crop 32, stride 16 -> buckets {32, 48, 64} per axis
    assert set(warmed) == {(h, w) for h in (32, 48, 64)
                           for w in (32, 48, 64)}
    n_compiled = eng._fused_predict._cache_size()
    assert n_compiled == len(warmed)  # one fused program per bucket

    rng = np.random.RandomState(0)
    shapes = [(33, 40), (35, 44), (47, 37)]  # all -> bucket (48, 48)
    for h, w in shapes:
        img = rng.rand(h, w, 3).astype(np.float32)
        pred = eng.predict_semantic(img, *memory)
        assert pred.shape == (h, w)
    # serving 3 distinct shapes reused the warmed programs
    assert eng._fused_predict._cache_size() == n_compiled


def test_bucket_padding_is_ignored_by_clustering(eng):
    """The extra bucket padding carries ignore labels, so predictions on
    the real pixels match the unbucketed (exact-pad) computation."""
    rng = np.random.RandomState(1)
    img = rng.rand(34, 34, 3).astype(np.float32)  # buckets to 48x48
    memory = (jnp.asarray(rng.rand(30, 8).astype(np.float32)),
              jnp.asarray(rng.randint(0, 4, 30).astype(np.int32)),
              jnp.ones((30,), bool))
    pred_bucketed = eng.predict_semantic(img, *memory)

    eng.pad_buckets = False
    pred_exact = eng.predict_semantic(img, *memory)
    # same sliding-window grid here? no: pad 48 vs 34 changes windows.
    # The invariant that MUST hold: both produce valid class maps at the
    # image resolution and agree on the vast majority of pixels.
    assert pred_bucketed.shape == pred_exact.shape == (34, 34)
    agree = (pred_bucketed == pred_exact).mean()
    assert agree > 0.9, agree
