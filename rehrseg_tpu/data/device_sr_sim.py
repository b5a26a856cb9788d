"""Device-side LR simulation for stage-1 SR training.

The reference simulates each LR patch on the host per sample: rational
B-spline downsample of the blurred image (order 3) and the label (order 0)
along the through-plane axis, then a random zero-out of the first/last
context slice (train_set.py:394-408). At 260k steps x batch 32 this host
work dominates on a weak host. Here the downsample is a precomputed-matrix
einsum on the MXU over the whole batch, and the slice dropout uses the JAX
PRNG — one jitted call per batch.

Ordering note: the reference applies flips/transpose AFTER the resize; the
center-aligned resize matrix commutes with flips along the resized axis and
the transpose never touches it, so doing host flips first and the device
resize last is numerically identical. The zero-slice dropout then applies to
the post-flip first/last slice instead of the pre-flip one — a symmetric,
distribution-identical difference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.bspline import resize_1d_jax


@partial(jax.jit, static_argnames=("slice_separation", "zero_dropout"))
def simulate_lr_batch(key, hr_source: jnp.ndarray, slice_separation: float,
                      zero_dropout: bool = True):
    """hr_source: (B, X, Z, Y, 2) with channel 0 = (pre-blurred) image,
    channel 1 = label. Returns (B, X/sep, Z, Y, 2) LR patches.
    """
    img = resize_1d_jax(hr_source[..., 0:1], slice_separation, axis=1, order=3)
    lab = resize_1d_jax(hr_source[..., 1:], slice_separation, axis=1, order=0)
    out = jnp.concatenate([img, lab], axis=-1)

    # the reference zero-slice dropout applies only to 3D (FLAVR) patches
    # with more than one z-slice (train_set.py:402-408); WDSR batches are 4D
    if zero_dropout and hr_source.ndim == 5 and hr_source.shape[2] > 1:
        b = out.shape[0]
        k1, k2 = jax.random.split(key)
        drop_first = jax.random.uniform(k1, (b,)) < 0.1
        drop_last = jax.random.uniform(k2, (b,)) < 0.1
        first = jnp.where(drop_first[:, None, None, None],
                          0.0, out[:, 0])
        last = jnp.where(drop_last[:, None, None, None],
                         0.0, out[:, -1])
        out = out.at[:, 0].set(first).at[:, -1].set(last)
    return out
