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


def test_aligned_starts_coverage_guard():
    """Snapped starts may not leave any voxel uncovered: a patch narrower
    than the W snap with a multi-tile W axis must fail loudly (the silent
    alternative is a label map with never-predicted holes), and a grid
    whose rounded starts open a too-wide gap is rebuilt with extra
    aligned tiles."""
    with pytest.raises(ValueError, match="aligned tile grid"):
        aligned_sliding_window_starts((12, 38, 38), (4, 16, 16), 0.5)
    starts, padded = aligned_sliding_window_starts(
        (12, 38, 190), (4, 16, 128), 0.5)
    ws = sorted(set(starts[:, 2]))
    assert all(b - a <= 128 for a, b in zip(ws, ws[1:]))
    assert ws[-1] + 128 == padded[2]


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


def _dice(a, b):
    inter = np.sum((a == 1) & (b == 1))
    return 2.0 * inter / max(1, (a == 1).sum() + (b == 1).sum())


def _near_boundary(lab, band=2):
    """Mask of voxels within `band` of a label boundary (6-neighborhood
    shifts — no scipy)."""
    edge = np.zeros_like(lab, bool)
    for ax in range(3):
        d = np.diff(lab, axis=ax) != 0
        edge |= np.concatenate(
            [d, np.zeros_like(np.take(d, [0], axis=ax))], axis=ax)
        edge |= np.concatenate(
            [np.zeros_like(np.take(d, [0], axis=ax)), d], axis=ax)
    near = edge.copy()
    for _ in range(band - 1):
        grown = near.copy()
        for ax in range(3):
            grown |= np.roll(near, 1, axis=ax) | np.roll(near, -1, axis=ax)
        near = grown
    return near


@pytest.fixture(scope="module")
def trained_small_model():
    """SMALL_ARCH SegModel briefly trained to segment the bright blob —
    the diverging-grid tests need a model whose labels are a real
    segmentation (an untrained net emits noise-like labels that disagree
    everywhere under ANY grid change, telling us nothing about the grids)."""
    import optax

    rng = np.random.default_rng(7)
    vol = _blob_volume((12, 38, 190), rng)
    lab = (vol > 1.5).astype(np.int32)
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(1), jnp.zeros((1, 4, 16, 16, 1)))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            # train BOTH heads — the dual diverging-grid test compares HR
            # labels too, and an untrained HR head emits noise
            lr, hr = model.apply(p, x)
            y_hr = jnp.repeat(y, 4, axis=1)
            return (jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                        lr, y))
                    + jnp.mean(
                        optax.softmax_cross_entropy_with_integer_labels(
                            hr, y_hr)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    # 400 steps sharpens the logits enough that near-tie disagreements
    # between the two tile-overlap weightings collapse to the boundary
    # band (at 120 steps a few uncertain background speckles survive >2
    # voxels from any boundary; at 400 none do and LR Dice hits 0.9998)
    for _ in range(400):
        xs, ys = [], []
        for _ in range(8):
            sx, sy, sz = (rng.integers(0, s - p + 1) for s, p in
                          zip(vol.shape, (4, 16, 16)))
            xs.append(vol[sx:sx + 4, sy:sy + 16, sz:sz + 16, None])
            ys.append(lab[sx:sx + 4, sy:sy + 16, sz:sz + 16])
        params, opt, loss = step(params, opt, jnp.asarray(np.stack(xs)),
                                 jnp.asarray(np.stack(ys)))
    assert float(loss) < 0.1, f"tiny model failed to train (loss {loss})"
    return model, params, vol[..., None]


@pytest.mark.heavy
def test_aligned_engine_diverging_grid(trained_small_model):
    """Quality equivalence where the grids actually DIFFER (VERDICT r4 weak
    #5): at (12, 38, 38) with patch (4, 16, 16) the parity H/W starts are
    {0, 7, 15, 22} (neither 8- nor 128-aligned — the bench volume's
    W {0, 124, 249} class scaled down) while the aligned grid snaps to
    8/128 multiples. The label maps are not bit-equal by construction
    (different tile overlap weights); assert Dice >= 0.999 on the blob,
    total disagreement < 1e-3 of the volume, and every disagreement within
    2 voxels of a label boundary in the parity map (measured: Dice 0.9998,
    4 disagreeing voxels, 0 outside the band)."""
    model, params, vol = trained_small_model
    patch = (4, 16, 128)

    steps = compute_steps_for_sliding_window(vol.shape[:3], patch, 0.5)
    assert steps[1] == [0, 7, 15, 22] and steps[2] == [0, 62]
    starts, padded = aligned_sliding_window_starts(vol.shape[:3], patch, 0.5)
    assert set(steps[1]) != set(starts[:, 1])   # H grid genuinely differs
    assert set(steps[2]) != set(starts[:, 2])   # W grid genuinely differs
    assert np.all(starts[:, 1] % 8 == 0) and np.all(starts[:, 2] % 128 == 0)

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
    assert want.sum() > 100 and got.sum() > 100
    assert _dice(got, want) >= 0.999
    disagree = got != want
    assert np.mean(disagree) < 1e-3
    assert not np.any(disagree & ~_near_boundary(want))


@pytest.mark.heavy
def test_aligned_dual_engine_diverging_grid(trained_small_model):
    """Same diverging-grid check for the dual LR+HR engine (z_scale=4).
    The HR head argmaxes z-interpolated logits, so its boundary band is
    4x thicker in z and carries more near-ties: measured LR Dice 0.9998
    (4 voxels), HR Dice 0.992 (645 voxels) — ALL inside the 2-voxel
    boundary band for both heads."""
    model, params, vol = trained_small_model
    patch = (4, 16, 128)

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
    for dice_floor, got, want in ((0.999, got_lr, want_lr),
                                  (0.99, got_hr, want_hr)):
        assert got.shape == want.shape
        assert _dice(got, want) >= dice_floor
        disagree = got != want
        assert np.mean(disagree) < 3e-3
        assert not np.any(disagree & ~_near_boundary(want))


def test_aligned_engine_padded_volume(rng, small_model):
    """A volume needing aligned-grid padding: the engine output equals the
    per-tile reference math (pad -> aligned starts -> z-grouped TTA ->
    unmirror-mean -> bf16 gaussian -> accumulate -> argmax -> crop),
    computed here with plain numpy/jax ops."""
    from tests.test_pallas_tail import xla_reference

    # patch W must be >= the 128 W-snap on a multi-tile W axis (coverage
    # guard) — the old (6, 27, 20)/(4, 16, 16) shape snapped W starts to
    # {0, 128} and silently left voxels 16..127 under no tile
    model, params = small_model
    patch = (4, 16, 128)
    vol = _blob_volume((6, 27, 190), rng)[..., None]

    def lr_fn_planes(p, b):
        return segmodel_apply_packed(SMALL_ARCH, p, b, pack_max_channels=64,
                                     plane_out=True)

    got = predict_sliding_window_labels_aligned(lr_fn_planes, params, vol,
                                                patch, num_classes=2)
    assert got.shape == vol.shape[:3]

    starts, padded = aligned_sliding_window_starts(vol.shape[:3], patch, 0.5)
    assert tuple(padded) != vol.shape[:3]       # padding genuinely exercised
    volp = np.pad(vol, [(0, padded[i] - vol.shape[i]) for i in range(3)]
                  + [(0, 0)])
    from rehrseg_tpu.infer.sliding_window import _mirror_batch_zgrouped
    g = np.asarray(_device_gaussian(patch, True))
    logits = np.zeros((2, *padded), np.float32)
    dev = jnp.asarray(volp.astype(np.float32), jnp.bfloat16)
    pd, ph, pw = patch
    for row in starts:
        sx, sy, sz, valid = (int(v) for v in row)
        tile = dev[sx:sx + pd, sy:sy + ph, sz:sz + pw]
        batch = _mirror_batch_zgrouped(tile)
        preds = lr_fn_planes(params, batch)
        logits = xla_reference(logits, preds, g, (sx, sy, sz, valid))
    want = np.argmax(logits, 0).astype(np.uint8)[
        :vol.shape[0], :vol.shape[1], :vol.shape[2]]
    np.testing.assert_array_equal(got, want)
