"""Intensity normalization (reference utils/seg_utils.py:74-174).

numpy versions operate on whole volumes; `*_batch` versions are jittable and
normalize channel 0 per sample, matching the reference behavior on batched
tensors (channels-last here).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def zscore_normalization(image: np.ndarray) -> np.ndarray:
    image = image.astype(np.float32, copy=True)
    mean = image.mean()
    std = image.std()
    image -= mean
    image /= max(std, 1e-8)
    return image


def zeroone_normalization(image: np.ndarray) -> np.ndarray:
    image = image.astype(np.float32, copy=True)
    mn, mx = image.min(), image.max()
    image -= mn
    image /= (mx - mn)
    return image


def percentile_normalization(image: np.ndarray, p_min: float = 0.5,
                             p_max: float = 99.5,
                             strictly_positive: bool = True) -> np.ndarray:
    image = image.astype(np.float32, copy=False)
    v_min, v_max = np.percentile(image, [p_min, p_max])
    if v_min < 0 and strictly_positive:
        v_min = 0
    out = np.clip(image, v_min, v_max)
    return (out - v_min) / (v_max - v_min)


def zscore_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample z-score of channel 0 (batch layout (B, *spatial, C));
    returns only the normalized channel-0 slab like the reference tensor path
    (seg_utils.py:137-149) which operates on channel 0."""
    img = x[..., 0:1]
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(img, axis=axes, keepdims=True)
    std = jnp.std(img, axis=axes, keepdims=True)
    return (img - mean) / jnp.maximum(std, 1e-8)
