"""Aligned-tile-grid sliding-window engine (interpret-mode Pallas kernel on
CPU): grid properties, plane_out model parity, and end-to-end label
equality against both the per-tile reference math and the parity engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.infer.sliding_window import (
    aligned_sliding_window_starts, sliding_window_starts,
    predict_sliding_window_labels_aligned,
    predict_sliding_window_dual_labels_aligned,
    predict_sliding_window_labels, predict_sliding_window_dual_labels,
    compute_steps_for_sliding_window, _device_gaussian)
from rehrseg_tpu.models import SegModel
from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed
from tests.test_models import SMALL_ARCH


def test_aligned_starts_properties():
    starts, padded = aligned_sliding_window_starts(
        (20, 455, 633), (16, 320, 384), 0.5)
    assert padded == (20, 456, 640)
    assert np.all(starts[:, 1] % 8 == 0)
    assert np.all(starts[:, 2] % 128 == 0)
    # same tile count as the parity grid, and full coverage of the far edge
    parity = sliding_window_starts((20, 455, 633), (16, 320, 384), 0.5)
    assert len(starts) == len(parity)
    assert starts[:, 0].max() + 16 == 20
    assert starts[:, 1].max() + 320 == padded[1]
    assert starts[:, 2].max() + 384 == padded[2]


def test_plane_out_matches_channel_last(rng):
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    lr, hr = segmodel_apply_packed(SMALL_ARCH, params, x, dual=True,
                                   upscale=4, pack_max_channels=64)
    lr_p, hr_p = segmodel_apply_packed(SMALL_ARCH, params, x, dual=True,
                                       upscale=4, pack_max_channels=64,
                                       plane_out=True)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(lr, -1, 1)),
                               np.asarray(lr_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(hr, -1, 1)),
                               np.asarray(hr_p), rtol=1e-5, atol=1e-5)


def _blob_volume(shape, rng):
    """Structured volume: a bright ellipsoid on smooth background (label
    ties between engines are vanishingly unlikely, unlike iid noise)."""
    d, h, w = shape
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w), indexing="ij")
    vol = 3.0 * ((zz ** 2 + yy ** 2 + xx ** 2) < 0.4)
    vol += 0.05 * rng.normal(size=shape)
    return vol.astype(np.float32)


@pytest.fixture
def small_model(rng):
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(jax.random.key(1), x0)
    return model, params


def test_aligned_engine_matches_parity_engine(rng, small_model):
    """On a volume whose parity grid is already aligned, the aligned engine
    must produce the same labels as the parity engine (the only remaining
    differences are summation order and the bf16-rounded gaussian)."""
    model, params = small_model
    patch = (4, 16, 16)
    vol = _blob_volume((6, 24, 16), rng)[..., None]
    # parity starts: D {0,2}, H {0,8}, W {0} — all aligned already
    steps = compute_steps_for_sliding_window(vol.shape[:3], patch, 0.5)
    assert steps[1] == [0, 8] and steps[2] == [0]

    def lr_fn(p, b):
        return segmodel_apply_packed(SMALL_ARCH, p, b, pack_max_channels=64)

    def lr_fn_planes(p, b):
        return segmodel_apply_packed(SMALL_ARCH, p, b, pack_max_channels=64,
                                     plane_out=True)

    want = predict_sliding_window_labels(lr_fn, params, vol, patch,
                                         slice_separation=1, mirror=True,
                                         num_classes=2)
    got = predict_sliding_window_labels_aligned(lr_fn_planes, params, vol,
                                                patch, num_classes=2)
    assert got.shape == want.shape
    assert np.mean(got != want) < 1e-3
    assert got.sum() > 0  # the blob segmented as nonzero somewhere


def test_aligned_dual_engine_matches_parity(rng, small_model):
    model, params = small_model
    patch = (4, 16, 16)
    vol = _blob_volume((6, 24, 16), rng)[..., None]

    def dual_fn(p, b):
        return segmodel_apply_packed(SMALL_ARCH, p, b, pack_max_channels=64,
                                     dual=True, upscale=4)

    def dual_fn_planes(p, b):
        return segmodel_apply_packed(SMALL_ARCH, p, b, pack_max_channels=64,
                                     dual=True, upscale=4, plane_out=True)

    want_lr, want_hr = predict_sliding_window_dual_labels(
        dual_fn, params, vol, patch, slice_separation=4, mirror=True,
        num_classes=2)
    got_lr, got_hr = predict_sliding_window_dual_labels_aligned(
        dual_fn_planes, params, vol, patch, slice_separation=4,
        num_classes=2)
    assert got_lr.shape == want_lr.shape
    assert got_hr.shape == want_hr.shape
    assert np.mean(got_lr != want_lr) < 1e-3
    assert np.mean(got_hr != want_hr) < 1e-3


def test_aligned_engine_padded_volume(rng, small_model):
    """A volume needing aligned-grid padding: the engine output equals the
    per-tile reference math (pad -> aligned starts -> z-grouped TTA ->
    unmirror-mean -> bf16 gaussian -> accumulate -> argmax -> crop),
    computed here with plain numpy/jax ops."""
    from tests.test_pallas_tail import xla_reference

    model, params = small_model
    patch = (4, 16, 16)
    vol = _blob_volume((6, 27, 20), rng)[..., None]

    def lr_fn_planes(p, b):
        return segmodel_apply_packed(SMALL_ARCH, p, b, pack_max_channels=64,
                                     plane_out=True)

    got = predict_sliding_window_labels_aligned(lr_fn_planes, params, vol,
                                                patch, num_classes=2)
    assert got.shape == (6, 27, 20)

    starts, padded = aligned_sliding_window_starts(vol.shape[:3], patch, 0.5)
    volp = np.pad(vol, [(0, padded[i] - vol.shape[i]) for i in range(3)]
                  + [(0, 0)])
    from rehrseg_tpu.infer.sliding_window import _mirror_batch_zgrouped
    g = np.asarray(_device_gaussian(patch, True))
    logits = np.zeros((2, *padded), np.float32)
    dev = jnp.asarray(volp.astype(np.float32), jnp.bfloat16)
    for row in starts:
        sx, sy, sz, valid = (int(v) for v in row)
        tile = dev[sx:sx + 4, sy:sy + 16, sz:sz + 16]
        batch = _mirror_batch_zgrouped(tile)
        preds = lr_fn_planes(params, batch)
        logits = xla_reference(logits, preds, g, (sx, sy, sz, valid))
    want = np.argmax(logits, 0).astype(np.uint8)[:6, :27, :20]
    np.testing.assert_array_equal(got, want)
