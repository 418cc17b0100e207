"""Location / color local-feature generation.

Behavioral reference: spml/models/embeddings/local_model.py in twke18/SPML
(GaussianConv2d:13, LocationColorNetwork:38). Pure functions here — the
"network" has no trainable parameters (the Gaussian kernel is fixed), so
a flax module adds nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spml_tpu.ops import common


def gaussian_kernel(ksize: int) -> np.ndarray:
    """The reference's (slightly unusual) kernel: sqrt(dy^2 + dx^2)
    normalized by its own sum (local_model.py:25-27)."""
    w = (np.arange(ksize, dtype=np.float32) - ksize // 2) ** 2
    w = np.sqrt(w[None, :] + w[:, None])
    return w / w.sum()


def smooth_colors(images: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Depthwise 'Gaussian' blur, VALID padding (torch conv default),
    NHWC. Output is (H-k+1, W-k+1) like the reference."""
    k = jnp.asarray(gaussian_kernel(ksize))
    c = images.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    out = jax.lax.conv_general_dilated(
        images, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jax.lax.stop_gradient(out)


def location_color_features(images: jnp.ndarray,
                            size: tuple[int, int],
                            use_color: bool = False,
                            use_location: bool = True,
                            norm_color: bool = False,
                            smooth_ksize: int | None = None) -> jnp.ndarray:
    """[B, H, W, 3] images -> [B, h, w, L] local features.

    Location channels: normalized (y, x) grid shifted to [-0.5, 0.5]
    (local_model.py:88-93). Color channels: optionally blurred, resized
    to `size`, per-image zero-centered and max-|.|-normalized
    (local_model.py:96-116).
    """
    n = images.shape[0]
    h, w = size
    feats = []
    if use_location:
        loc = common.generate_location_features(h, w) - 0.5
        feats.append(jnp.broadcast_to(loc[None], (n, h, w, 2)))
    if use_color:
        x = images
        if smooth_ksize:
            x = smooth_colors(x, smooth_ksize)
        # antialias=False: torch F.interpolate(bilinear) semantics —
        # colors are DOWNscaled to the stride-4 grid here
        x = jax.image.resize(x, (n, h, w, x.shape[-1]), method="linear",
                             antialias=False)
        if norm_color:
            mean = jnp.mean(x.reshape(n, -1, x.shape[-1]), axis=1)
            x = x - mean[:, None, None, :]
            mx = jnp.max(jnp.abs(x.reshape(n, -1, x.shape[-1])), axis=1)
            x = x / mx[:, None, None, :]
        feats.append(x)
    return jnp.concatenate(feats, axis=-1)
