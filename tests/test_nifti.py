"""Round-trip tests for the pure-Python NIfTI reader/writer."""

import numpy as np
import pytest

from rehrseg_tpu.io import nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.int16])
def test_nifti_roundtrip(tmp_path, rng, suffix, dtype):
    data = (rng.normal(size=(7, 9, 5)) * 10).astype(dtype)
    affine = np.diag([1.0, 1.0, 4.0, 1.0])
    affine[:3, 3] = [-10.0, 3.0, 7.0]
    img = nifti.NiftiImage(data=data, affine=affine)
    path = str(tmp_path / f"vol{suffix}")
    nifti.save(img, path)

    loaded = nifti.load(path)
    assert loaded.data.dtype == dtype
    assert np.array_equal(loaded.data, data)
    assert np.allclose(loaded.affine, affine)
    assert loaded.header.get_zooms()[:3] == pytest.approx((1.0, 1.0, 4.0))


def test_nifti_4d_roundtrip(tmp_path, rng):
    data = rng.normal(size=(6, 6, 4, 2)).astype(np.float32)
    img = nifti.NiftiImage(data=data)
    path = str(tmp_path / "vol4d.nii.gz")
    nifti.save(img, path)
    loaded = nifti.load(path)
    assert loaded.shape == (6, 6, 4, 2)
    assert np.allclose(loaded.get_fdata(np.float32), data)


def test_itk_like_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(5, 8, 9)).astype(np.float32)  # (z, y, x)
    img = nifti.ItkLikeImage(array=arr, spacing=(1.0, 1.0, 4.0),
                             origin=(1.0, 2.0, 3.0))
    path = str(tmp_path / "itk.nii.gz")
    nifti.write_image_itk(img, path)
    loaded = nifti.read_image_itk(path)
    assert np.allclose(loaded.array, arr, atol=1e-6)
    assert loaded.GetSpacing() == pytest.approx((1.0, 1.0, 4.0))
    assert loaded.GetOrigin() == pytest.approx((1.0, 2.0, 3.0))


def test_parse_image_nifti(tmp_path, rng):
    from rehrseg_tpu.io import parse_image
    data = rng.normal(size=(10, 10, 6)).astype(np.float32)
    img = nifti.NiftiImage(data=data, affine=np.diag([1.0, 1.0, 4.0, 1.0]))
    path = str(tmp_path / "sub.nii.gz")
    nifti.save(img, path)
    image, sep, lr_axis, fwhm, header, affine, mn, mx = parse_image(path, 4.0, 1.0)
    assert sep == 4.0
    assert lr_axis == 0  # 3D volumes hardcode lr_axis=0 like the reference
    assert fwhm == pytest.approx(np.sqrt(15.0))
    assert mn == data.min() and mx == data.max()


def test_lazy_h5(tmp_path, rng):
    from rehrseg_tpu.io import write_h5, parse_image
    arr = rng.normal(size=(4, 4, 4)).astype(np.float32)
    path = str(tmp_path / "sub.h5")
    write_h5(path, img_hr=arr)
    image, sep, lr_axis, fwhm, *_ = parse_image(path, 4.0, 1.0)
    assert lr_axis is None
    sub = image["img_hr"]
    assert sub.shape == (4, 4, 4)
    assert np.allclose(sub[:], arr)
