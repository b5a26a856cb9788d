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


def test_lr_axis_orientation_quirks(rng):
    """Pin the reference's lr_axis_to_z permutations AND its quirk that
    z_axis_to_lr_axis applies the SAME permutation (not the inverse) — an
    involution only for lr_axis==2 (parse_image_file.py:100-131)."""
    from rehrseg_tpu.io import lr_axis_to_z, z_axis_to_lr_axis
    img = rng.normal(size=(3, 4, 5, 2))
    assert np.array_equal(lr_axis_to_z(img, 0), img.transpose(2, 0, 1, 3))
    assert np.array_equal(lr_axis_to_z(img, 1), img.transpose(1, 2, 0, 3))
    assert np.array_equal(lr_axis_to_z(img, 2), img)
    for ax in (0, 1, 2):
        assert np.array_equal(z_axis_to_lr_axis(img, ax),
                              lr_axis_to_z(img, ax))
    # 5D inputs are squeezed first
    assert lr_axis_to_z(img[None, ..., :1], 0).shape == (5, 3, 4)


def test_volume_dataclass_and_h5_store(tmp_path, rng):
    from rehrseg_tpu.io import load_volume, write_h5, H5Store
    arr = rng.normal(size=(4, 5, 6)).astype(np.float32)
    path = str(tmp_path / "sub.h5")
    write_h5(path, img=arr, seg=(arr > 0).astype(np.uint8))
    vol = load_volume(path, 4.0, 1.0)
    assert isinstance(vol.data, H5Store)
    assert sorted(vol.data.keys()) == ["img", "seg"]
    ds = vol.data["img"]
    assert ds[...] is ds  # Ellipsis returns the handle (reference semantics)
    assert np.array_equal(ds.ravel(), arr.ravel())
    assert np.array_equal(ds[1:3], arr[1:3])
    assert vol.as_reference_tuple()[1] == 4.0


def test_normalize_roundtrip(rng):
    from rehrseg_tpu.io import normalize, inv_normalize
    x = rng.normal(size=(8, 8)).astype(np.float64) * 7 + 3
    y, lo, hi = normalize(x, a=-1, b=1)
    assert y.min() == pytest.approx(-1) and y.max() == pytest.approx(1)
    assert np.allclose(inv_normalize(y, lo, hi, a=-1, b=1), x)
    y0, lo0, hi0 = normalize(x, a=0, b=1)
    assert np.allclose(inv_normalize(y0, lo0, hi0, a=0, b=1), x)


def test_scl_slope_zero_means_unscaled(tmp_path, rng):
    """NIfTI-1 spec / nibabel parity: scl_slope == 0 -> ignore BOTH slope
    and inter (a 'scaling unset' header must not shift intensities)."""
    data = rng.normal(size=(4, 4, 2)).astype(np.float32)
    img = nifti.NiftiImage(data=data, affine=np.eye(4))
    img.header.scl_slope = 0.0
    img.header.scl_inter = 100.0
    np.testing.assert_array_equal(img.get_fdata(np.float32), data)
    # real scaling still applies
    img.header.scl_slope = 2.0
    img.header.scl_inter = 1.0
    np.testing.assert_allclose(img.get_fdata(np.float32), data * 2 + 1,
                               rtol=1e-6)


def test_two_file_nifti_rejected(tmp_path, rng):
    """'ni1' magic (a .hdr/.img pair's header) must fail loudly, not
    reinterpret header bytes as voxels."""
    import struct
    p = str(tmp_path / "pair.nii")
    data = rng.normal(size=(2, 2, 2)).astype(np.float32)
    nifti.save(nifti.NiftiImage(data=data, affine=np.eye(4)), p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<4s", raw, 344, b"ni1\x00")
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="two-file"):
        nifti.load(p)


def test_checkpoint_named_item_resume(tmp_path, rng):
    """restore with a non-default item name resolves latest_step against
    THAT name (it used to look for 'state' dirs and crash)."""
    import jax
    import jax.numpy as jnp
    import optax
    from rehrseg_tpu.train import TrainState
    from rehrseg_tpu.train import checkpoint as ckpt
    tx = optax.sgd(1e-3)
    params = {"w": jnp.asarray(rng.normal(size=(3,)).astype(np.float32))}
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(7)) if hasattr(state, "replace") \
        else type(state)(params=state.params, opt_state=state.opt_state,
                         step=7)
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, state, name="seg")
    restored = ckpt.restore_checkpoint(d, TrainState.create(params, tx),
                                       name="seg")
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    raw = ckpt.restore_checkpoint_raw(d, name="seg")
    assert int(raw["step"]) == 7
