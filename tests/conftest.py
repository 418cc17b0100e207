"""Test config: force an 8-device virtual CPU mesh so sharding/collective
paths are exercised without TPU hardware.

Note: this image pre-imports jax via a sitecustomize that registers the
TPU backend, so JAX_PLATFORMS/XLA_FLAGS env vars are too late — flip the
platform through jax.config instead (works as long as no computation ran).
"""

import os

os.environ.setdefault("SPML_TPU_TEST", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
