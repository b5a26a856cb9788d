"""MRI slice-profile blur: FWHM math, kernel synthesis, separable device blur.

Replaces the `degrade` package used by the reference
(/root/reference/utils/parse_image_file.py:4,85 and
/root/reference/utils/blur_kernel_ops.py:7-35):

  - ``fwhm_needed(target, thick)``: blur FWHM required to degrade a
    ``target``-mm-resolution signal to ``thick``-mm slice thickness,
    assuming FWHMs add in quadrature: sqrt(thick^2 - target^2).
  - ``fwhm_units_to_voxel_space``: physical FWHM -> voxels at target spacing.
  - ``parse_kernel``: 1-D normalized slice-profile kernel of window
    ``2*round(fwhm)+1``; 'rf-pulse-slr' profiles come from the SLR designer
    in :mod:`rehrseg_tpu.ops.slr`, 'gaussian' from the analytic gaussian.

The device-side blur is a separable 1-D convolution along a chosen axis,
expressed with ``lax.conv_general_dilated`` so XLA fuses it with surrounding
elementwise work.
"""

from __future__ import annotations

from functools import lru_cache
from math import ceil

import numpy as np
import jax.numpy as jnp
from jax import lax


def fwhm_needed(target_thickness: float, slice_thickness: float) -> float:
    """Blur FWHM (physical units) to take target-res -> slice-thickness res."""
    return float(np.sqrt(max(slice_thickness ** 2 - target_thickness ** 2, 0.0)))


def fwhm_units_to_voxel_space(fwhm: float, voxel_size: float) -> float:
    return float(fwhm / voxel_size)


def blur_fwhm_in_voxels(target_thickness: float, slice_thickness: float) -> float:
    return fwhm_units_to_voxel_space(
        fwhm_needed(target_thickness, slice_thickness), target_thickness
    )


@lru_cache(maxsize=32)
def _slr_profile_cached(tb: float = 4.0):
    from . import slr
    x, prof = slr.slice_profile(n=128, tb=tb)
    meas = slr.measure_fwhm(x, prof)
    return x, prof, meas


def select_kernel(window_size: int, kernel_type: str, fwhm: float) -> np.ndarray:
    """1-D blur kernel of length ``window_size`` with the requested FWHM.

    Supported types: 'rf-pulse-slr' (SLR excitation slice profile),
    'gaussian'. Kernel is NOT normalized here (parse_kernel does that),
    matching the reference flow (blur_kernel_ops.py:12-14).
    """
    offsets = np.arange(window_size, dtype=np.float64) - (window_size - 1) / 2.0
    if kernel_type == "rf-pulse-slr":
        x, prof, meas = _slr_profile_cached()
        # Rescale the spatial axis so the profile FWHM equals `fwhm` voxels.
        sample_x = offsets * (meas / fwhm)
        kernel = np.interp(sample_x, x, prof, left=0.0, right=0.0)
    elif kernel_type == "gaussian":
        sigma = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))
        kernel = np.exp(-0.5 * (offsets / sigma) ** 2)
    else:
        raise ValueError(f"Unknown blur kernel type: {kernel_type}")
    return kernel.astype(np.float64)


def parse_kernel(blur_kernel_file, blur_kernel_type: str, blur_fwhm: float) -> np.ndarray:
    """Normalized 1-D kernel as a (L,) float32 array.

    Window-size convention matches blur_kernel_ops.py:11-13:
    ``2*round(fwhm)+1``. The reference shapes its kernel (1,1,L,1) for torch
    conv2d; we return the flat kernel and let :func:`blur_axis` choose the
    axis.
    """
    if blur_kernel_file is not None:
        blur_kernel = np.load(blur_kernel_file)
    else:
        window_size = int(2 * round(blur_fwhm) + 1)
        blur_kernel = select_kernel(window_size, blur_kernel_type, fwhm=blur_fwhm)
    blur_kernel = np.asarray(blur_kernel, dtype=np.float64)
    blur_kernel = blur_kernel / blur_kernel.sum()
    return blur_kernel.squeeze().astype(np.float32)


def calc_extended_patch_size(blur_kernel: np.ndarray, patch_size):
    """Extended patch + crop slices removing blur boundary effects
    (blur_kernel_ops.py:21-35)."""
    L = blur_kernel.shape[0]
    ext_patch_size = [p + 2 * ceil(L / 2) if p != 1 else p for p in patch_size]
    ext_patch_crop = [(e - p) // 2 for e, p in zip(ext_patch_size, patch_size)]
    ext_patch_crop = tuple(slice(d, -d) for d in ext_patch_crop if d != 0)
    return ext_patch_size, ext_patch_crop


def blur_axis(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Separable 'same' (zero-padded) 1-D convolution along ``axis``.

    Equivalent to the reference's ``F.conv2d(img, kernel[None,None,:,None],
    padding='same')`` applied along the chosen axis (train_set.py:325,332).
    Jit-friendly: static axis/kernel length.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    moved = jnp.moveaxis(x, axis, -1)
    lead_shape = moved.shape[:-1]
    n = moved.shape[-1]
    flat = moved.reshape((-1, n, 1))  # (batch, length, feature)
    k = jnp.asarray(kernel, dtype=flat.dtype).reshape((-1, 1, 1))  # (win, in, out)
    out = lax.conv_general_dilated(
        flat, k, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    out = out.reshape(lead_shape + (n,))
    return jnp.moveaxis(out, -1, axis)


def blur_axis_np(x: np.ndarray, kernel: np.ndarray, axis: int) -> np.ndarray:
    """Host-side equivalent of :func:`blur_axis` (zero-padded 'same' conv)."""
    pad = len(kernel) // 2
    xp = np.moveaxis(x, axis, -1)
    padded = np.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(pad, pad)], mode="constant")
    # cross-correlation (torch conv semantics) == np.convolve with flipped kernel
    out = np.apply_along_axis(lambda v: np.convolve(v, kernel[::-1], mode="valid"),
                              -1, padded)
    if len(kernel) % 2 == 0:
        out = out[..., :xp.shape[-1]]
    return np.moveaxis(out.astype(x.dtype, copy=False), -1, axis)
