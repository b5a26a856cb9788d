"""Volume parsing, orientation, normalization, and HDF5 intermediate stores.

Parity with the reference L1 I/O layer
(/root/reference/utils/parse_image_file.py:7-131): `parse_image` returns the
array (or a lazy HDF5 handle), the slice separation, the LR axis, the blur
FWHM in voxels, header/affine, and intensity extrema. The `degrade` FWHM math
(`fwhm_needed`, `fwhm_units_to_voxel_space`) is reimplemented in
:mod:`rehrseg_tpu.ops.blur`.
"""

from __future__ import annotations

import h5py
import numpy as np

from . import nifti
from ..ops.blur import blur_fwhm_in_voxels


def normalize(x, a=-1, b=1):
    """Affine-map intensities to [a, b]; returns (scaled, orig_min, orig_max)."""
    orig_min = x.min()
    orig_max = x.max()
    numer = (x - orig_min) * (b - a)
    denom = orig_max - orig_min
    return a + numer / denom, orig_min, orig_max


def inv_normalize(x, orig_min, orig_max, a=-1, b=1):
    tmp = x - a
    tmp = tmp * (orig_max - orig_min)
    tmp = tmp / (b - a)
    tmp += orig_min
    return tmp


class LazyHDF5File:
    """Lazy view into an HDF5 file (parity: parse_image_file.py:24-50)."""

    def __init__(self, path, internal_path=None):
        self.path = path
        self.internal_path = internal_path
        if self.internal_path:
            with h5py.File(self.path, "r") as f:
                self.ndim = f[self.internal_path].ndim
                self.shape = f[self.internal_path].shape

    def ravel(self):
        with h5py.File(self.path, "r") as f:
            return f[self.internal_path][:].ravel()

    def __getitem__(self, arg):
        if isinstance(arg, str) and not self.internal_path:
            return LazyHDF5File(self.path, arg)
        if arg is Ellipsis:
            return LazyHDF5File(self.path, self.internal_path)
        with h5py.File(self.path, "r") as f:
            return f[self.internal_path][arg]


def parse_image(img_file: str, slice_thickness: float, target_thickness: float):
    """Open a volume file and return image + anisotropy metadata.

    Returns (image, slice_separation, lr_axis, blur_fwhm_voxels, header,
    affine, orig_min, orig_max) — reference parse_image_file.py:52-96.
    """
    if str(img_file).endswith(".nii.gz") or str(img_file).endswith(".nii"):
        obj = nifti.load(img_file)
        voxel_size = tuple(float(v) for v in obj.header.get_zooms())
        lr_axis = int(np.argmax(voxel_size)) if len(voxel_size) == 2 else 0
        image = obj.get_fdata(dtype=np.float32)
        header = obj.header
        affine = obj.affine
        orig_min = image.min()
        orig_max = image.max()
    elif str(img_file).endswith(".h5"):
        image = LazyHDF5File(str(img_file))
        header = None
        affine = None
        lr_axis = None
        orig_min = None
        orig_max = None
    else:
        raise ValueError(f"Unsupported volume file: {img_file}")

    slice_separation = float(slice_thickness / target_thickness)
    blur_fwhm_voxels = blur_fwhm_in_voxels(target_thickness, slice_thickness)
    return (image, slice_separation, lr_axis, blur_fwhm_voxels, header, affine,
            orig_min, orig_max)


def lr_axis_to_z(img: np.ndarray, lr_axis: int) -> np.ndarray:
    """Orient so the low-resolution axis is "z" (parse_image_file.py:100-114)."""
    if img.ndim == 5:
        img = np.squeeze(img)
    if lr_axis == 0:
        return img.transpose(2, 0, 1, 3)
    elif lr_axis == 1:
        return img.transpose(1, 2, 0, 3)
    return img


def z_axis_to_lr_axis(img: np.ndarray, lr_axis: int) -> np.ndarray:
    """Inverse-ish orientation used by the reference (parse_image_file.py:118-131).

    Note the reference applies the *same* permutation as lr_axis_to_z here
    (an involution only for lr_axis==2); we preserve that behavior for parity.
    """
    if img.ndim == 5:
        img = np.squeeze(img, axis=4)
    if lr_axis == 0:
        return img.transpose(2, 0, 1, 3)
    elif lr_axis == 1:
        return img.transpose(1, 2, 0, 3)
    return img


def write_h5(path: str, **datasets) -> None:
    """Write named arrays to an HDF5 file (stage-intermediate store)."""
    with h5py.File(path, "w") as f:
        for k, v in datasets.items():
            f.create_dataset(k, data=v)


def read_h5(path: str, *names):
    with h5py.File(path, "r") as f:
        return tuple(f[n][:] for n in names)
