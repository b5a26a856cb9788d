"""Pixel shuffle along a single spatial axis (channels-last).

The reference WDSR upsamples through-plane resolution with a 1-D pixel
shuffle (/root/reference/models/wdsr.py:13-20): channels (out*scale, with
output-channel major / shuffle-phase minor ordering) fold into the first
spatial axis. In XLA this is a pure reshape/transpose — zero-FLOP, fusible.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_axis(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, X, Y, C*scale) -> (B, X*scale, Y, C).

    Channel index c_in = c_out * scale + phase, so output
    out[b, x*scale + phase, y, c_out] = x[b, x, y, c_out*scale + phase],
    matching the torch view/permute sequence at wdsr.py:13-20.
    """
    b, nx, ny, cs = x.shape
    c = cs // scale
    out = x.reshape(b, nx, ny, c, scale)
    out = out.transpose(0, 1, 4, 2, 3)          # (B, X, scale, Y, C)
    return out.reshape(b, nx * scale, ny, c)
