"""_stride8_affinity must reuse one compiled program per (model,
params, image size) — rebuilding the jax.jit wrapper per image defeats
the compile cache and re-traced + re-compiled the whole backbone for
EVERY image (observed ~49 s/image over the TPU tunnel in the round-3
pipeline drill). Locks the round-3 fix (runner._AFF8_CACHE).
"""

import jax.numpy as jnp
import numpy as np

from spml_tpu.config import load_config
from spml_tpu.inference import runner


class _StubModel:
    """Tiny jit-traceable stand-in for the embedding model."""

    def apply(self, variables, x, train=False, resize_as_input=True):
        del variables, train, resize_as_input
        emb = jnp.concatenate([x, x], axis=-1)  # [1, H, W, 6]
        return emb, {}


def test_aff8_program_cached_per_shape():
    cfg = load_config(overrides={"test": {"crop_size": [64, 64]}})
    model, evars = _StubModel(), {"params": {}}
    runner._AFF8_CACHE.clear()

    img_a = np.random.RandomState(0).rand(48, 40, 3).astype(np.float32)
    aff1 = runner._stride8_affinity(cfg, model, evars, img_a)
    assert len(runner._AFF8_CACHE) == 1
    fn_first = next(iter(runner._AFF8_CACHE.values()))

    # same size -> same cached program object, identical result
    aff2 = runner._stride8_affinity(cfg, model, evars, img_a)
    assert len(runner._AFF8_CACHE) == 1
    assert next(iter(runner._AFF8_CACHE.values())) is fn_first
    np.testing.assert_array_equal(np.asarray(aff1), np.asarray(aff2))
    n = (48 // 8) * (40 // 8)
    assert aff1.shape == (n, n)

    # a new size adds exactly one more entry
    img_b = np.random.RandomState(1).rand(40, 48, 3).astype(np.float32)
    runner._stride8_affinity(cfg, model, evars, img_b)
    assert len(runner._AFF8_CACHE) == 2

    runner._AFF8_CACHE.clear()
