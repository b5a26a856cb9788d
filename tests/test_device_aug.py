"""Device-side warp + augmentation vs scipy/host oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.ops import warp as W


def test_prefilter_matrix_matches_scipy(rng):
    from scipy.ndimage import spline_filter1d
    x = rng.normal(size=(23,)).astype(np.float64)
    M = W.prefilter_matrix(23)
    got = M @ x
    ref = spline_filter1d(x, order=3, mode="mirror")
    assert np.allclose(got, ref, atol=1e-4)


def test_map_coordinates_cubic_matches_scipy_interior(rng):
    from scipy.ndimage import map_coordinates
    img = rng.normal(size=(24, 20)).astype(np.float32)
    # interior coords only (border handling differs: mirror vs constant)
    cy = rng.uniform(3, 20, size=(15, 15))
    cx = rng.uniform(3, 16, size=(15, 15))
    coords = np.stack([cy, cx])
    got = np.asarray(W.map_coordinates_cubic_2d(jnp.asarray(img),
                                                jnp.asarray(coords)))
    ref = map_coordinates(img.astype(np.float64), coords, order=3,
                          mode="mirror")
    assert np.allclose(got, ref, atol=1e-3)


def test_map_coordinates_linear_matches_scipy(rng):
    from scipy.ndimage import map_coordinates
    img = rng.normal(size=(16, 16)).astype(np.float32)
    cy = rng.uniform(0, 15, size=(8, 8))
    cx = rng.uniform(0, 15, size=(8, 8))
    coords = np.stack([cy, cx])
    got = np.asarray(W.map_coordinates_linear_2d(jnp.asarray(img),
                                                 jnp.asarray(coords)))
    ref = map_coordinates(img.astype(np.float64), coords, order=1,
                          mode="mirror")
    assert np.allclose(got, ref, atol=1e-4)


def test_rotate_scale_coords_identity():
    coords, mask = W.rotate_scale_coords((8, 8), jnp.float32(0.0),
                                         jnp.float32(1.0), (8, 8))
    # identity transform: coords = pixel grid
    gy, gx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    assert np.allclose(np.asarray(coords[0]), gy, atol=1e-5)
    assert np.allclose(np.asarray(coords[1]), gx, atol=1e-5)
    assert np.asarray(mask).all()


def test_rotate_scale_coords_matches_host_mesh(rng):
    """Device mesh == batchgenerators-style host mesh for given angle/scale."""
    from rehrseg_tpu.data.transforms import (
        create_zero_centered_coordinate_mesh, rotate_coords_2d)
    angle, scale = 0.7, 1.2
    patch = (12, 10)
    host = create_zero_centered_coordinate_mesh(patch)
    host = rotate_coords_2d(host, angle) * scale
    host[0] += 16 / 2.0 - 0.5
    host[1] += 14 / 2.0 - 0.5
    dev, _ = W.rotate_scale_coords(patch, jnp.float32(angle),
                                   jnp.float32(scale), (16, 14))
    assert np.allclose(np.asarray(dev), host, atol=1e-4)


def test_warp_seg_binary(rng):
    seg = np.zeros((16, 16), dtype=np.float32)
    seg[4:12, 4:12] = 1.0
    coords, mask = W.rotate_scale_coords((16, 16), jnp.float32(0.3),
                                         jnp.float32(1.0), (16, 16))
    out = np.asarray(W.warp_seg_2d(jnp.asarray(seg), coords, mask))
    assert set(np.unique(out)).issubset({0.0, 1.0})
    assert out.sum() > 10  # blob survives rotation


def test_augment_seg_batch_shapes(rng):
    from rehrseg_tpu.data.device_aug import augment_seg_batch
    B, z, Y, X, sep = 2, 4, 24, 24, 4
    img = jnp.asarray(rng.normal(size=(B, z, Y, X, 1)).astype(np.float32))
    llr = jnp.asarray((rng.normal(size=(B, z, Y, X, 1)) > 0).astype(np.float32))
    lhr = jnp.asarray((rng.normal(size=(B, z * sep, Y, X, 1)) > 0).astype(np.float32))
    unc = jnp.asarray(rng.uniform(size=(B, z, Y, X, 1)).astype(np.float32))
    fn = jax.jit(lambda k, a, b, c, d: augment_seg_batch(
        k, a, b, c, d, patch_hw=(16, 16)))
    im2, llr2, lhr2, unc2 = fn(jax.random.key(0), img, llr, lhr, unc)
    assert im2.shape == (B, z, 16, 16, 1)
    assert llr2.shape == (B, z, 16, 16, 1)
    assert lhr2.shape == (B, z * sep, 16, 16, 1)
    assert unc2.shape == (B, z, 16, 16, 1)
    assert set(np.unique(np.asarray(llr2))).issubset({0.0, 1.0})
    assert np.isfinite(np.asarray(im2)).all()


def test_lowres_matrices_match_scipy(rng):
    from rehrseg_tpu.data.device_aug import _lowres_matrices, _ZOOM_FACTORS
    from scipy.ndimage import zoom
    n = 20
    mats = _lowres_matrices(n)
    x = rng.normal(size=(n,))
    for i, f in enumerate(_ZOOM_FACTORS):
        target = max(int(round(n * f)), 1)
        down = zoom(x, target / n, order=0)
        ref = zoom(down, n / len(down), order=3)[:n]
        got = mats[i] @ x
        assert np.allclose(got, ref, atol=1e-4), f


def test_device_warp_matches_host_spatial_aug(rng):
    """End-to-end spatial-augmentation parity: same angle/scale through the
    host (scipy) path and the device (B-spline matmul) path."""
    from rehrseg_tpu.data.transforms import augment_spatial_2d

    data = rng.normal(size=(2, 32, 32)).astype(np.float32)
    seg = np.zeros((1, 32, 32), dtype=np.float32)
    seg[0, 10:22, 8:20] = 1.0

    class FixedRng:
        def uniform(self, lo=0.0, hi=1.0):
            return lo

        def random(self):
            return 0.9

    out_d, out_s = augment_spatial_2d(data, [seg], (24, 24), FixedRng(),
                                      angle_x=(0.6, 0.6), scale=(1.1, 1.1))
    coords, mask = W.rotate_scale_coords((24, 24), jnp.float32(0.6),
                                         jnp.float32(1.1), (32, 32))
    dev_d = np.stack([np.asarray(W.warp_data_2d(jnp.asarray(data[c]), coords,
                                                mask)) for c in range(2)])
    dev_s = np.asarray(W.warp_seg_2d(jnp.asarray(seg[0]), coords, mask))
    # interior parity (border spline tails differ: mirror+mask vs constant)
    interior = (slice(None), slice(4, 20), slice(4, 20))
    assert np.abs(out_d[interior] - dev_d[interior]).max() < 1e-3
    agree = (out_s[0][0, 4:20, 4:20] == dev_s[4:20, 4:20]).mean()
    assert agree > 0.97


def test_augment_sr_hr_batch(rng):
    """Stage-1 device intensity aug (train_set.py:259-277 semantics): only
    the HR image channel changes; labels ride through untouched; same key
    -> same output; different keys -> different augmentations somewhere in
    the batch."""
    import jax
    from rehrseg_tpu.data.device_aug import augment_sr_hr_batch

    hr = rng.normal(size=(8, 16, 24, 24, 2)).astype(np.float32)
    hr[..., 1] = (hr[..., 1] > 0).astype(np.float32)
    fn = jax.jit(augment_sr_hr_batch)
    out1 = np.asarray(fn(jax.random.key(3), jnp.asarray(hr)))
    out2 = np.asarray(fn(jax.random.key(3), jnp.asarray(hr)))
    out3 = np.asarray(fn(jax.random.key(4), jnp.asarray(hr)))

    assert out1.shape == hr.shape
    np.testing.assert_array_equal(out1, out2)          # deterministic in key
    np.testing.assert_array_equal(out1[..., 1], hr[..., 1])  # labels intact
    # with 8 samples and p(no-op) ~ 0.28 per sample, some must change
    assert np.abs(out1[..., 0] - hr[..., 0]).max() > 1e-6
    assert np.abs(out1[..., 0] - out3[..., 0]).max() > 1e-6
    assert np.isfinite(out1).all()
