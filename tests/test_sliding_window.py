"""Tests for the jitted gaussian sliding-window engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.infer import (
    compute_steps_for_sliding_window, sliding_window_starts,
    predict_sliding_window_logits, evaluate_case_volume,
)


def test_steps_match_reference_example():
    """Reference docstring case (seg_utils.py:180-181): image 110, patch 64,
    step 0.5 → starts [0, 23, 46]."""
    steps = compute_steps_for_sliding_window([110], [64], 0.5)
    assert steps[0] == [0, 23, 46]


def test_steps_cover_volume():
    for size, tile in [((20, 64, 48), (8, 32, 32)), ((8, 32, 32), (8, 32, 32))]:
        steps = compute_steps_for_sliding_window(size, tile, 0.5)
        for dim in range(3):
            assert steps[dim][0] == 0
            assert steps[dim][-1] == size[dim] - tile[dim]


def test_starts_grid():
    starts = sliding_window_starts((16, 32, 32), (8, 16, 16), 0.5)
    assert starts.shape[1] == 3
    assert starts.dtype == np.int32
    assert (starts >= 0).all()


def _constant_model(value, num_classes=2, z_scale=1):
    """model_fn producing constant logits, shape-correct for the engine."""
    def fn(params, batch):
        b, d, h, w, c = batch.shape
        return jnp.full((b, d * z_scale, h, w, num_classes), value,
                        dtype=jnp.float32)
    return fn


def test_constant_model_recovers_constant():
    """Gaussian weighting with overlap must still normalize to the constant."""
    data = np.random.default_rng(0).normal(size=(12, 24, 24, 1)).astype(np.float32)
    logits = predict_sliding_window_logits(
        _constant_model(3.5), None, data, (8, 16, 16), mirror=False)
    assert logits.shape == (12, 24, 24, 2)
    assert np.allclose(logits, 3.5, atol=1e-4)


def test_hr_head_z_scaling():
    data = np.zeros((8, 16, 16, 1), dtype=np.float32)
    logits = predict_sliding_window_logits(
        _constant_model(1.0, z_scale=4), None, data, (4, 8, 8),
        slice_separation=4, mirror=False)
    assert logits.shape == (32, 16, 16, 2)
    assert np.allclose(logits, 1.0, atol=1e-4)


def test_mirror_tta_flip_equivariance():
    """For a model equivariant to flips (identity on channel 0), TTA output
    equals the input patch content."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(8, 16, 16, 1)).astype(np.float32)

    def identity_model(params, batch):
        # logits = broadcast input channel to 2 classes: flip-equivariant
        return jnp.concatenate([batch, batch], axis=-1)

    import jax.numpy as jnp
    logits = predict_sliding_window_logits(
        identity_model, None, data, (8, 16, 16), mirror=True,
        input_dtype=jnp.float32)
    # one tile covering everything; flip-equivariant model → mean over TTA
    # equals the unflipped output
    assert np.allclose(logits[..., 0], data[..., 0], atol=1e-4)


def test_mirror_tta_averages_eight():
    """A model returning the tile's corner value is NOT flip-equivariant;
    TTA must average all 8 orientations."""
    data = np.zeros((4, 8, 8, 1), dtype=np.float32)
    data[0, 0, 0, 0] = 8.0  # corner marker

    def corner_model(params, batch):
        v = batch[:, 0, 0, 0, 0]  # (B,)
        out = jnp.ones((batch.shape[0], 4, 8, 8, 2)) * v[:, None, None, None, None]
        return out

    logits = predict_sliding_window_logits(
        corner_model, None, data, (4, 8, 8), mirror=True, use_gaussian=False)
    # exactly one of 8 flip combos puts the marked corner at [0,0,0] and the
    # model sees 8.0; the other 7 see 0 → average = 1.0 everywhere... except
    # the identity combo sees 8.0: mean = 8/8 = 1.0
    assert np.allclose(logits, 1.0, atol=1e-4)


def test_real_segmodel_through_engine(rng):
    """End-to-end: SegModel LR head through the engine."""
    from rehrseg_tpu.models import SegModel
    from tests.test_models import SMALL_ARCH

    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(jax.random.key(0), x0)

    def lr_fn(p, batch):
        return model.apply(p, batch)[0]

    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)
    label = (rng.normal(size=(6, 24, 24)) > 1).astype(np.uint8)
    pred_lr, pred_hr, dice = evaluate_case_volume(
        lr_fn, params, vol, label, (4, 16, 16), mirror=False)
    assert pred_lr.shape == (6, 24, 24)
    assert pred_lr.dtype == np.uint8
    assert 0 <= dice <= 1


def test_hr_pass_through_engine(rng):
    from rehrseg_tpu.models import SegModel
    from tests.test_models import SMALL_ARCH

    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(jax.random.key(0), x0)

    def lr_fn(p, batch):
        return model.apply(p, batch)[0]

    def hr_fn(p, batch):
        return model.apply(p, batch)[1]

    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)
    pred_lr, pred_hr, _ = evaluate_case_volume(
        lr_fn, params, vol, None, (4, 16, 16), slice_separation=4,
        hr_model_fn=hr_fn, mirror=False)
    assert pred_hr.shape == (24, 24, 24)

    # dual one-pass engine gives identical results to the two-pass path
    def dual_fn(p, batch):
        return model.apply(p, batch)

    pred_lr2, pred_hr2, _ = evaluate_case_volume(
        lr_fn, params, vol, None, (4, 16, 16), slice_separation=4,
        dual_model_fn=dual_fn, mirror=False)
    assert np.array_equal(pred_lr, pred_lr2)
    assert np.array_equal(pred_hr, pred_hr2)


def test_streamed_matches_single_pass(rng):
    """z-slab streaming produces exactly the single-pass prediction."""
    from rehrseg_tpu.infer.sliding_window import (
        predict_sliding_window_labels, predict_sliding_window_labels_streamed)
    from rehrseg_tpu.models import SegModel
    from tests.test_models import SMALL_ARCH

    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))

    def lr_fn(p, batch):
        return model.apply(p, batch)[0]

    vol = rng.normal(size=(16, 24, 24, 1)).astype(np.float32)
    single = predict_sliding_window_labels(
        lr_fn, params, vol, (4, 16, 16), mirror=False,
        input_dtype=jnp.float32)
    for z_slab in (1, 2, 3):
        streamed = predict_sliding_window_labels_streamed(
            lr_fn, params, vol, (4, 16, 16), z_slab_tiles=z_slab,
            mirror=False, input_dtype=jnp.float32)
        assert np.array_equal(single, streamed), z_slab


def test_tiles_per_step_equivalence(rng):
    """k-tile batched scan == single-tile scan exactly (incl. the repeated-
    last-tile padding when the tile count doesn't divide)."""
    import jax.numpy as jnp
    from rehrseg_tpu.models import SegModel
    from rehrseg_tpu.infer.sliding_window import predict_sliding_window_labels
    from tests.test_models import SMALL_ARCH

    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))

    def lr_fn(p, b):
        return model.apply(p, b)[0]

    vol = rng.normal(size=(6, 24, 40, 1)).astype(np.float32)
    outs = [predict_sliding_window_labels(
        lr_fn, params, vol, (4, 16, 16), mirror=True,
        input_dtype=jnp.float32, tiles_per_step=k) for k in (1, 2, 3)]
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[0], outs[2])


def test_streamed_dual_matches_single_pass(rng):
    """Streamed LR+HR z-slab prediction exactly equals the one-pass dual
    path — including the HR head's sep-scaled z offsets (reference HR
    semantics: seg_utils.py:273-274, 775-784)."""
    from rehrseg_tpu.infer.sliding_window import (
        predict_sliding_window_dual_labels,
        predict_sliding_window_dual_labels_streamed)
    from rehrseg_tpu.models import SegModel
    from tests.test_models import SMALL_ARCH

    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))

    def dual_fn(p, batch):
        return model.apply(p, batch)

    vol = rng.normal(size=(16, 24, 24, 1)).astype(np.float32)
    lr1, hr1 = predict_sliding_window_dual_labels(
        dual_fn, params, vol, (4, 16, 16), slice_separation=4,
        mirror=False, input_dtype=jnp.float32)
    assert hr1.shape == (64, 24, 24)
    for z_slab in (1, 2, 3):
        lr2, hr2 = predict_sliding_window_dual_labels_streamed(
            dual_fn, params, vol, (4, 16, 16), slice_separation=4,
            z_slab_tiles=z_slab, mirror=False, input_dtype=jnp.float32)
        assert np.array_equal(lr1, lr2), z_slab
        assert np.array_equal(hr1, hr2), z_slab
