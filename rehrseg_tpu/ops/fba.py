"""Fourier burst accumulation (reference utils/fba.py:4-21).

Fuses multiple SR reconstructions in the Fourier domain: with p='inf' takes
the per-frequency max; otherwise magnitude-power-weighted average. Provided
as both numpy (host) and jax (device) versions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fba(imgs, p="infinity"):
    vs_hat = [np.fft.rfftn(img) for img in imgs]
    if p in ("infinity", "inf"):
        out = np.max(vs_hat, axis=0)
    else:
        p = float(p)
        denominator = np.sum([np.abs(v) ** p for v in vs_hat], axis=0)
        ws = [np.abs(v) ** p / denominator for v in vs_hat]
        out = np.sum([w * v for w, v in zip(ws, vs_hat)], axis=0)
    return np.fft.irfftn(out).astype(np.float32)


def fba_jax(imgs: jnp.ndarray, p: float | None = None) -> jnp.ndarray:
    """imgs: (K, ...) stack. p=None means the 'infinity' max rule."""
    vs_hat = jnp.fft.rfftn(imgs, axes=tuple(range(1, imgs.ndim)))
    if p is None:
        out = jnp.max(vs_hat, axis=0)
    else:
        mags = jnp.abs(vs_hat) ** p
        ws = mags / jnp.sum(mags, axis=0, keepdims=True)
        out = jnp.sum(ws * vs_hat, axis=0)
    return jnp.fft.irfftn(out, axes=tuple(range(out.ndim))).astype(jnp.float32)
