"""Device-side 2D spatial warping with exact cubic B-spline interpolation.

The reference augments on the host with scipy's map_coordinates through
batchgenerators (seg_utils.py:460-472) — at ~0.4 s/sample that starves a TPU.
This module implements the same numerics on device:

  - the cubic-spline prefilter is a precomputed (n, n) matrix (mirror
    boundary, machine-precision parity with scipy.ndimage.spline_filter1d),
    applied as two MXU matmuls;
  - evaluation at warped coordinates gathers the 4x4 coefficient
    neighborhood with cubic B-spline weights (scipy map_coordinates
    order=3 parity, mode-dependent boundary);
  - segmentation channels use order-1 (bilinear) + >=0.5 thresholding per
    label, matching batchgenerators' interpolate_img(is_seg=True, order=1).

Everything is shape-static and jit/vmap friendly: per-sample random
rotation/scale enter as traced scalars.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=64)
def prefilter_matrix(n: int) -> np.ndarray:
    """(n, n) cubic-spline prefilter with mirror boundary: P @ x equals
    scipy.ndimage.spline_filter1d(x, order=3, mode='mirror')."""
    from scipy.ndimage import spline_filter1d
    # columns of the identity are the basis vectors; filtering along axis 0
    # makes column k equal F @ e_k, i.e. the result IS the operator matrix
    return spline_filter1d(np.eye(n), order=3, axis=0, mode="mirror",
                           output=np.float64).astype(np.float32)


def prefilter_2d(img: jnp.ndarray) -> jnp.ndarray:
    """Prefilter the trailing two axes of (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    ph = jnp.asarray(prefilter_matrix(h), img.dtype)
    pw = jnp.asarray(prefilter_matrix(w), img.dtype)
    out = jnp.einsum("...hw,Hh->...Hw", img, ph)
    return jnp.einsum("...Hw,Ww->...HW", out, pw)


def _cubic_bspline_weights(t: jnp.ndarray):
    """B-spline basis values for taps at offsets (-1, 0, 1, 2) from floor."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1 - 3 * t + 3 * t2 - t3) / 6.0
    w1 = (4 - 6 * t2 + 3 * t3) / 6.0
    w2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0
    w3 = t3 / 6.0
    return w0, w1, w2, w3


def _mirror_index(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """scipy 'mirror' boundary: reflect about first/last sample
    (period 2n-2)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n - 2
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def map_coordinates_cubic_2d(img: jnp.ndarray, coords: jnp.ndarray,
                             prefiltered: bool = False) -> jnp.ndarray:
    """scipy.ndimage.map_coordinates(order=3, mode='mirror')-equivalent.

    img: (H, W); coords: (2, *out_shape) in array-index space.
    NOTE: scipy's border handling for out-of-range coords with
    mode='nearest'/'constant' differs; the spatial augmentation uses
    'constant' for data — handled by the caller via masking.
    """
    if not prefiltered:
        img = prefilter_2d(img)
    h, w = img.shape
    cy, cx = coords[0], coords[1]
    fy = jnp.floor(cy)
    fx = jnp.floor(cx)
    ty = (cy - fy).astype(img.dtype)
    tx = (cx - fx).astype(img.dtype)
    wy = _cubic_bspline_weights(ty)
    wx = _cubic_bspline_weights(tx)
    base_y = fy.astype(jnp.int32)
    base_x = fx.astype(jnp.int32)

    out = jnp.zeros(cy.shape, img.dtype)
    for dy in range(-1, 3):
        iy = _mirror_index(base_y + dy, h)
        row_w = wy[dy + 1]
        for dx in range(-1, 3):
            ix = _mirror_index(base_x + dx, w)
            out = out + row_w * wx[dx + 1] * img[iy, ix]
    return out


def map_coordinates_linear_2d(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with mirror boundary (order=1 parity)."""
    h, w = img.shape
    cy, cx = coords[0], coords[1]
    fy = jnp.floor(cy)
    fx = jnp.floor(cx)
    ty = (cy - fy).astype(img.dtype)
    tx = (cx - fx).astype(img.dtype)
    y0 = _mirror_index(fy.astype(jnp.int32), h)
    y1 = _mirror_index(fy.astype(jnp.int32) + 1, h)
    x0 = _mirror_index(fx.astype(jnp.int32), w)
    x1 = _mirror_index(fx.astype(jnp.int32) + 1, w)
    return ((1 - ty) * (1 - tx) * img[y0, x0] + (1 - ty) * tx * img[y0, x1]
            + ty * (1 - tx) * img[y1, x0] + ty * tx * img[y1, x1])


def rotate_scale_coords(patch_size, angle, scale, in_shape):
    """Zero-centered mesh -> rotate(angle) -> *scale -> center in in_shape
    (batchgenerators augment_spatial semantics, center crop).

    angle, scale: traced scalars. Returns (2, *patch_size) coords plus an
    in-bounds mask for 'constant' border emulation.
    """
    ph, pw = patch_size
    yy = jnp.arange(ph, dtype=jnp.float32) - (ph - 1) / 2.0
    xx = jnp.arange(pw, dtype=jnp.float32) - (pw - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # batchgenerators rotate_coords_2d: coords^T @ R with R=[[c,-s],[s,c]]
    ry = gy * cos + gx * sin
    rx = -gy * sin + gx * cos
    ry = ry * scale + (in_shape[0] / 2.0 - 0.5)
    rx = rx * scale + (in_shape[1] / 2.0 - 0.5)
    inb = ((ry >= 0) & (ry <= in_shape[0] - 1)
           & (rx >= 0) & (rx <= in_shape[1] - 1))
    return jnp.stack([ry, rx]), inb


def warp_data_2d(img: jnp.ndarray, coords: jnp.ndarray, mask: jnp.ndarray,
                 cval: float = 0.0) -> jnp.ndarray:
    """Order-3 warp with 'constant' border: out-of-range -> cval."""
    out = map_coordinates_cubic_2d(img, coords)
    return jnp.where(mask, out, cval)


def warp_seg_2d(seg: jnp.ndarray, coords: jnp.ndarray, mask: jnp.ndarray,
                cval: float = 0.0) -> jnp.ndarray:
    """Order-1 warp of a BINARY label map with >=0.5 threshold
    (interpolate_img(is_seg=True) parity for {0,1} labels)."""
    out = map_coordinates_linear_2d(seg, coords)
    out = jnp.where(out >= 0.5, 1.0, 0.0)
    return jnp.where(mask, out, cval)
