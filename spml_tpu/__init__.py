"""spml_tpu — a TPU-native rebuild of SPML (pixel-to-segment contrastive
learning for universal weakly-supervised segmentation).

Reference behavior: twke18/SPML (ICLR'21). This package re-designs the
algorithm for TPU: a single jit-compiled SPMD program over a
``jax.sharding.Mesh`` replaces the reference's thread-based
``nn.DataParallel`` + synchronized BatchNorm; per-image spherical k-means
and the contrastive losses are expressed as static-shape, mask-based
batched matmuls that tile onto the MXU.
"""

__version__ = "0.1.0"
