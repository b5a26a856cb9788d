"""Native C++ host library vs numpy/scipy oracles."""

import numpy as np
import pytest

from rehrseg_tpu import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native build unavailable")


@requires_native
def test_native_builds():
    assert native.available()


@requires_native
def test_gunzip_roundtrip(rng):
    import gzip
    payload = rng.integers(0, 255, size=100_000, dtype=np.uint8).tobytes()
    gz = gzip.compress(payload)
    assert native.gunzip(gz) == payload
    # and our gzip output is readable by the gzip module
    gz2 = native.gzip_compress(payload)
    assert gzip.decompress(gz2) == payload


@requires_native
def test_spline_filter_matches_scipy(rng):
    from scipy.ndimage import spline_filter1d
    x = rng.normal(size=(4, 37, 5)).astype(np.float32)
    got = native.spline_filter_axis(x, axis=1)
    ref = spline_filter1d(x, order=3, axis=1, mode="mirror",
                          output=np.float32)
    assert np.allclose(got, ref, atol=2e-4)


@requires_native
def test_blur_matches_numpy(rng):
    from rehrseg_tpu.ops.blur import blur_axis_np, parse_kernel
    k = parse_kernel(None, "rf-pulse-slr", 3.873)
    x = rng.normal(size=(3, 24, 7)).astype(np.float32)
    got = native.blur_axis(x, k, axis=1)
    ref = blur_axis_np(x, k, axis=1)
    assert np.allclose(got, ref, atol=1e-5)


@requires_native
def test_resize_axis_matches_matmul(rng):
    from rehrseg_tpu.ops.bspline import resize_matrix, as_fraction
    M = resize_matrix(16, as_fraction(4.0), 3)
    x = rng.normal(size=(2, 16, 9)).astype(np.float32)
    got = native.resize_axis_matrix(x, M, axis=1)
    ref = np.moveaxis(np.tensordot(M, np.moveaxis(x, 1, 0), axes=(1, 0)), 0, 1)
    assert got.shape == (2, 4, 9)
    assert np.allclose(got, ref, atol=1e-4)


@requires_native
def test_zscore_inplace(rng):
    x = rng.normal(3, 2, size=(64, 64)).astype(np.float32)
    out = native.zscore_inplace(x.copy())
    assert abs(out.mean()) < 1e-4
    assert abs(out.std() - 1) < 1e-3


@requires_native
def test_native_nifti_load_fast_path(tmp_path, rng):
    """io.nifti uses whatever gunzip path; cross-check against gzip module."""
    from rehrseg_tpu.io.nifti import NiftiImage, save, load
    data = rng.normal(size=(16, 16, 8)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    save(NiftiImage(data=data), p)
    img = load(p)
    assert np.allclose(img.data, data)


def test_gunzip_truncated_input_falls_back_or_raises():
    """A truncated gzip stream must not hang the native retry loop (it used
    to read Z_BUF_ERROR as 'buffer too small' and grow forever)."""
    import gzip as _gzip
    import pytest
    from rehrseg_tpu import native
    payload = bytes(range(256)) * 64
    blob = _gzip.compress(payload)
    truncated = blob[:len(blob) // 2]
    with pytest.raises(Exception):  # gzip-module fallback raises EOFError
        native.gunzip(truncated)
    # intact streams still inflate natively
    assert native.gunzip(blob) == payload
