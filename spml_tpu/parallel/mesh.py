"""Device mesh + sharding layout for data-parallel SPML training.

This module replaces the reference's entire distributed stack
(lib/nn/parallel/data_parallel.py, lib/nn/sync_batchnorm/* in
twke18/SPML): instead of thread-based replication with master/slave
BatchNorm reduction and explicit prototype gathers
(spml/models/utils.py:41-131), the train step is ONE jitted SPMD program
over a 1-D 'data' mesh:

* the batch axis of every input is sharded over 'data';
* parameters, optimizer state and the memory bank are replicated;
* BatchNorm batch statistics, prototype all-gathers, and loss reductions
  are inserted by XLA's SPMD partitioner as ICI collectives — the
  pixel-to-prototype loss couples every pixel with every image's
  prototypes, which GSPMD resolves with an all-gather of the (small)
  per-image prototype arrays rather than the (huge) pixel arrays.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with state replicated and batch sharded on the
    leading (global-batch) axis; the state is donated so memory-bank and
    parameter updates happen in place."""
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def device_put_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
