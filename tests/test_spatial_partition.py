"""Spatial (image-height) partitioning over a 2-D ('data','space') mesh.

No reference counterpart — twke18/SPML's DataParallel
(lib/nn/parallel/data_parallel.py) can only split the batch axis. Here
GSPMD additionally shards the H axis of every image/label tensor and
inserts conv halo exchanges, so crops/batches too large for one chip's
HBM train without changing the step. Correctness is locked the same way
the reference's SyncBN suite locks distribution
(lib/nn/sync_batchnorm/tests/test_sync_batchnorm.py): the N-device
spatially-sharded step must numerically match the 1-device oracle.
"""

import numpy as np
import jax
import pytest

from spml_tpu.parallel import mesh as mesh_lib
from spml_tpu.train import step as step_lib
from tests.test_train_step import _batch, _tiny_config

import jax.numpy as jnp


def _run(cfg, batch, mesh):
    img = jnp.zeros(batch["image"].shape)
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    state = mesh_lib.device_put_replicated(state, mesh)
    data = mesh_lib.device_put_batch(dict(batch), mesh)
    step = mesh_lib.shard_train_step(step_lib.make_train_step(cfg), mesh)
    state, metrics = step(state, data)
    return (jax.device_get(state.params),
            {k: float(v) for k, v in metrics.items()})


def test_mesh_shapes_and_shardings():
    devs = jax.devices("cpu")
    mesh = mesh_lib.make_mesh(devices=devs, spatial=2)
    assert mesh.shape == {"data": 4, "space": 2}
    # image [B,H,W,C] shards H over 'space'; tags [B,256] do not;
    # neither does a non-spatial ndim>=3 leaf (key allowlist, not an
    # ndim heuristic)
    sh4 = mesh_lib.batch_sharding(mesh, 4, "image")
    sh2 = mesh_lib.batch_sharding(mesh, 2, "semantic_tag")
    sh3 = mesh_lib.batch_sharding(mesh, 3, "proto_features")
    assert sh4.spec == jax.sharding.PartitionSpec("data", "space")
    assert sh2.spec == jax.sharding.PartitionSpec("data")
    assert sh3.spec == jax.sharding.PartitionSpec("data")
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(devices=devs, spatial=3)


@pytest.mark.slow
def test_spatial_equals_singlechip():
    """(data=4, space=2) sharded train step == 1-device oracle."""
    cfg = _tiny_config(batch=8, crop=32)
    rng = np.random.RandomState(3)
    batch = _batch(rng, 8, 32)

    devs = jax.devices("cpu")
    p1, m1 = _run(cfg, batch, mesh_lib.make_mesh(num_devices=1,
                                                 devices=devs))
    p8, m8 = _run(cfg, batch, mesh_lib.make_mesh(devices=devs, spatial=2))

    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=1e-4)
    np.testing.assert_allclose(m1["num_segments"], m8["num_segments"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
