"""In-plane 90-degree volume rotations (reference utils/rotate.py:5-31)."""

from __future__ import annotations

import numpy as np


_K = {0: 0, 360: 0, 90: 1, -90: -1, 180: 2, -180: -2, 270: 3, -270: -3}


def rotate_vol_2d(vol, angle: int):
    """Rotate each 2D in-plane slice of (hr, hr, lr[, c]) by a multiple of
    90 degrees. Works on numpy or jax arrays."""
    if angle not in _K:
        raise NotImplementedError(
            "Angles other than 90 degree rotations are not supported.")
    k = _K[angle]
    if k == 0:
        return vol
    try:
        import jax.numpy as jnp
        if not isinstance(vol, np.ndarray):
            return jnp.rot90(vol, k=k, axes=(0, 1))
    except ImportError:
        pass
    return np.rot90(vol, k=k, axes=(0, 1))
