"""Training state: parameters, BN statistics, optimizer state, and the
prototype memory bank as a fixed-shape ring buffer.

Behavioral reference in twke18/SPML: pyscripts/train/train.py:147-293 —
a python dict of per-step prototype tensors FIFO'd over the last
`memory_bank_size` steps, with batch indices incremented by the global
batch size each step so they never collide with the current batch.

TPU re-design: the bank is a [memory_bank_size, B*P, ...] array pytree
carried inside the jitted step (donated, so it lives on device and the
update is in-place); validity masks replace the variable prototype
counts.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class MemoryBank:
    prototype: jnp.ndarray          # [M, PG, D]
    prototype_with_loc: jnp.ndarray  # [M, PG, D+L]
    semantic_label: jnp.ndarray     # [M, PG] int32
    instance_label: jnp.ndarray     # [M, PG] int32
    batch_index: jnp.ndarray        # [M, PG] int32
    tag: jnp.ndarray                # [M, PG, tag_width] int32
    valid: jnp.ndarray              # [M, PG] bool

    @classmethod
    def create(cls, size: int, num_protos: int, dim: int, loc_dim: int,
               tag_width: int) -> "MemoryBank":
        m, p = size, num_protos
        return cls(
            prototype=jnp.zeros((m, p, dim), jnp.float32),
            prototype_with_loc=jnp.zeros((m, p, dim + loc_dim), jnp.float32),
            semantic_label=jnp.zeros((m, p), jnp.int32),
            instance_label=jnp.zeros((m, p), jnp.int32),
            batch_index=jnp.zeros((m, p), jnp.int32),
            tag=jnp.zeros((m, p, tag_width), jnp.int32),
            valid=jnp.zeros((m, p), bool),
        )

    def push(self, prototype, prototype_with_loc, semantic_label,
             instance_label, batch_index, tag, valid,
             global_batch: int) -> "MemoryBank":
        """FIFO insert of the current step's prototypes; existing entries'
        batch indices shift by `global_batch` (train.py:289-293)."""
        def rolled(old, new):
            return jnp.concatenate([old[1:], new[None]], axis=0)

        shifted = self.batch_index + global_batch
        return MemoryBank(
            prototype=rolled(self.prototype, prototype),
            prototype_with_loc=rolled(self.prototype_with_loc,
                                      prototype_with_loc),
            semantic_label=rolled(self.semantic_label, semantic_label),
            instance_label=rolled(self.instance_label, instance_label),
            batch_index=rolled(shifted, batch_index + global_batch),
            tag=rolled(self.tag, tag),
            valid=rolled(self.valid, valid),
        )


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    memory: MemoryBank
    rng: jnp.ndarray
