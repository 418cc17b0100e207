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


def make_mesh(num_devices: int | None = None, devices=None,
              spatial: int = 1) -> Mesh:
    """1-D data mesh, or — with spatial > 1 — a 2-D ('data', 'space')
    mesh that additionally shards the image HEIGHT axis over `spatial`
    devices. GSPMD partitions the convolutions with halo exchanges over
    ICI (the CNN analog of sequence parallelism), so crops/batches too
    large for one chip's HBM can be trained without changing the step.
    No reference counterpart: twke18/SPML's DataParallel
    (lib/nn/parallel/data_parallel.py) can only split the batch axis.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    if spatial > 1:
        if devices.size % spatial:
            raise ValueError(
                f"{devices.size} devices not divisible by "
                f"spatial={spatial}")
        return Mesh(devices.reshape(-1, spatial),
                    axis_names=("data", "space"))
    return Mesh(devices, axis_names=("data",))


def _spatial(mesh: Mesh) -> bool:
    return "space" in mesh.axis_names and mesh.shape["space"] > 1


# Batch keys whose axis 1 is the image HEIGHT — the only leaves that
# shard over 'space'. An explicit allowlist (not an ndim heuristic): a
# future [B, P, D] batch leaf must not silently land on the spatial
# axis with the wrong layout.
SPATIAL_KEYS = frozenset({"image", "semantic_label", "instance_label"})


def batch_sharding(mesh: Mesh, ndim: int | None = None,
                   key: str | None = None) -> NamedSharding:
    """Leading axis sharded over 'data'; on a 2-D ('data', 'space') mesh,
    the known spatial leaves (SPATIAL_KEYS, [B, H, ...] with ndim >= 3)
    are additionally sharded over 'space' on axis 1."""
    if (_spatial(mesh) and ndim is not None and ndim >= 3
            and key in SPATIAL_KEYS):
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with state replicated and batch sharded on the
    leading (global-batch) axis; the state is donated so memory-bank and
    parameter updates happen in place."""
    repl = replicated_sharding(mesh)
    if _spatial(mesh):
        # batch leaves carry per-rank shardings (see batch_sharding);
        # inputs are committed by device_put_{replicated,batch}, and jit
        # honors committed input shardings when in_shardings is omitted.
        return jax.jit(
            train_step,
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def device_put_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    return {k: jax.device_put(v, batch_sharding(mesh, np.ndim(v), k))
            for k, v in batch.items()}


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
