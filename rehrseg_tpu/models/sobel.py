"""Sobel edge losses (reference models/losses.py:6-23, which used kornia;
dead code in the reference pipeline but part of its API surface).

`sobel_edges` matches kornia.filters.sobel: spatial-gradient magnitude with
reflect padding and (by default) normalized kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sobel_kernels(normalized: bool = True):
    gx = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    gy = gx.T
    if normalized:
        gx = gx / np.abs(gx).sum()
        gy = gy / np.abs(gy).sum()
    return gx, gy


def sobel_edges(x: jnp.ndarray, eps: float = 1e-6,
                normalized: bool = True) -> jnp.ndarray:
    """Edge magnitude of (B, H, W, C) images."""
    gx_k, gy_k = _sobel_kernels(normalized)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    def corr(k):
        out = jnp.zeros_like(x)
        for i in range(3):
            for j in range(3):
                out = out + k[i, j] * xp[:, i:i + x.shape[1], j:j + x.shape[2]]
        return out

    gx = corr(gx_k)
    gy = corr(gy_k)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def sobel_l1_loss(pred, target):
    """L1 between edge maps (reference GetSobel/losses.py semantics)."""
    return jnp.mean(jnp.abs(sobel_edges(pred) - sobel_edges(target)))


def sobel_mse_loss(pred, target):
    return jnp.mean((sobel_edges(pred) - sobel_edges(target)) ** 2)
