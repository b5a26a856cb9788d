"""Rational B-spline resize, expressed as precomputed interpolation matrices.

Replaces the reference's `resize` package (gitlab iacl pin; call sites
/root/reference/utils/train_set.py:395-396,516 and
/root/reference/models/wdsr.py:10,87): resize along chosen trailing dims with
sampling step ``dx`` (possibly rational), interpolation order 0 (nearest) or
3 (cubic B-spline with exact prefilter), output length ``round(n / dx)``,
and the two sample grids aligned at the center of the field of view.

TPU-first design: instead of gather/scatter interpolation on device, we
precompute (host-side, cached) a dense (m x n) matrix ``M`` such that
``out = M @ x`` reproduces B-spline interpolation exactly (the composition of
the cubic-spline prefilter — a linear operator — and B-spline basis
evaluation is linear in the input). On device a resize along an axis is then
a single ``jnp.einsum`` that XLA maps onto the MXU, instead of a bandwidth-
bound gather. Matrices are built with scipy (spline_filter1d /
map_coordinates on unit vectors) so the numerics match scipy's mirror-
boundary cubic spline to machine precision.
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def output_size(n: int, dx: float) -> int:
    """Output length for sampling step ``dx`` (matches `resize`'s round)."""
    return int(round(n / float(dx)))


def sample_coords(n: int, dx: float) -> np.ndarray:
    """Output sample coordinates in input-index units, FOV centers aligned.

    Input samples sit at 0..n-1 (unit spacing). The m output samples have
    spacing dx and share the FOV center (n-1)/2 with the input grid.
    """
    m = output_size(n, dx)
    j = np.arange(m, dtype=np.float64)
    return (n - 1) / 2.0 + (j - (m - 1) / 2.0) * float(dx)


@lru_cache(maxsize=256)
def resize_matrix(n: int, dx_frac: Fraction, order: int = 3) -> np.ndarray:
    """(m, n) matrix performing the 1-D resize ``out = M @ x``.

    ``dx_frac`` must be hashable/exact — pass a Fraction (see
    :func:`as_fraction`). order 0 = nearest neighbor, order 1/3 = spline with
    mirror boundary (scipy.ndimage conventions).
    """
    from scipy.ndimage import map_coordinates

    dx = float(dx_frac)
    coords = sample_coords(n, dx)
    m = coords.shape[0]
    M = np.zeros((m, n), dtype=np.float64)
    eye = np.eye(n, dtype=np.float64)
    for k in range(n):
        # map_coordinates(prefilter=True) == spline interp of the unit vector;
        # linearity makes columns of M exactly the interpolation weights.
        M[:, k] = map_coordinates(eye[k], [coords], order=order, mode="mirror")
    return M


def as_fraction(dx: float, max_den: int = 10000) -> Fraction:
    return Fraction(dx).limit_denominator(max_den)


def resize_1d_np(x: np.ndarray, dx: float, axis: int, order: int = 3) -> np.ndarray:
    """Host resize along ``axis`` (numpy)."""
    if float(dx) == 1.0:
        return x
    n = x.shape[axis]
    M = resize_matrix(n, as_fraction(dx), order)
    return np.moveaxis(np.tensordot(M, np.moveaxis(x, axis, 0), axes=(1, 0)), 0, axis)


def resize_nd_np(x: np.ndarray, dxyz, order: int = 3) -> np.ndarray:
    """Resize the trailing ``len(dxyz)`` dims (the `resize` package convention;
    reference applies (sep, 1) to the last two dims, train_set.py:395)."""
    nd = x.ndim
    k = len(dxyz)
    out = x
    for i, dx in enumerate(dxyz):
        axis = nd - k + i
        out = resize_1d_np(out, dx, axis, order)
    return out


def resize_1d_jax(x: jnp.ndarray, dx: float, axis: int, order: int = 3) -> jnp.ndarray:
    """Device resize along ``axis``: one matmul on the MXU.

    Shapes are static under jit, so the numpy matrix is computed at trace
    time and closed over as a constant.
    """
    if float(dx) == 1.0:
        return x
    n = x.shape[axis]
    M = jnp.asarray(resize_matrix(n, as_fraction(dx), order), dtype=x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...n,mn->...m", moved, M)
    return jnp.moveaxis(out, -1, axis)


def resize_nd_jax(x: jnp.ndarray, dxyz, order: int = 3) -> jnp.ndarray:
    nd = x.ndim
    k = len(dxyz)
    out = x
    for i, dx in enumerate(dxyz):
        axis = nd - k + i
        out = resize_1d_jax(out, dx, axis, order)
    return out


@lru_cache(maxsize=128)
def trilinear_upsample_matrix(n: int, scale: int, align_corners: bool = True) -> np.ndarray:
    """(n*scale, n) linear-interp matrix for upsampling one axis.

    Matches ``F.interpolate(..., scale_factor=(scale,1,1), mode='trilinear',
    align_corners=True)`` along the scaled axis (reference seg_model.py:204).
    align_corners=True: out coord j maps to j * (n-1) / (m-1).
    """
    m = n * scale
    M = np.zeros((m, n), dtype=np.float64)
    if n == 1:
        M[:, 0] = 1.0
        return M
    for j in range(m):
        if align_corners:
            pos = j * (n - 1) / (m - 1)
        else:
            pos = (j + 0.5) / scale - 0.5
            pos = min(max(pos, 0.0), n - 1)
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        t = pos - lo
        M[j, lo] += 1.0 - t
        M[j, hi] += t
    return M


def upsample_axis_linear(x: jnp.ndarray, scale: int, axis: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """Device linear upsample of one axis by an integer factor (matmul form)."""
    if scale == 1:
        return x
    n = x.shape[axis]
    M = jnp.asarray(trilinear_upsample_matrix(n, scale, align_corners), dtype=x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...n,mn->...m", moved, M)
    return jnp.moveaxis(out, -1, axis)


def zoom_axis_np(x: np.ndarray, factor: float, axis: int, order: int) -> np.ndarray:
    """scipy.ndimage.zoom parity along one axis (used by the pseudo-SR
    interpolation fallback, reference sr_utils.py:263-264)."""
    from scipy.ndimage import zoom
    factors = [1.0] * x.ndim
    factors[axis] = factor
    return zoom(x, factors, order=order)
