"""Deep-supervision mode: decoder outputs per resolution + weighted loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.models import SegModel
from rehrseg_tpu.train import (
    TrainState, nesterov_sgd, poly_epoch_schedule, make_seg_train_step,
    SegBatch,
)
from rehrseg_tpu.train.seg_trainer import ds_scales_from_arch, downsample_label
from tests.test_models import SMALL_ARCH


def test_ds_scales():
    scales = ds_scales_from_arch(SMALL_ARCH)
    # strides (1,1,1),(1,2,2),(2,2,2),(1,2,2): decoder has 3 outputs
    assert scales == [(1, 1, 1), (1, 2, 2), (2, 4, 4)]


def test_downsample_label():
    lab = jnp.arange(2 * 4 * 8 * 8, dtype=jnp.float32).reshape(2, 4, 8, 8, 1)
    out = downsample_label(lab, (2, 2, 2))
    assert out.shape == (2, 2, 4, 4, 1)
    assert float(out[0, 0, 0, 0, 0]) == float(lab[0, 0, 0, 0, 0])


def test_segmodel_deep_supervision_outputs(rng):
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH,
                     deep_supervision=True)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    outs, out_up = model.apply(params, x)
    assert isinstance(outs, list) and len(outs) == 3
    assert outs[0].shape == (1, 4, 16, 16, 2)   # highest res first
    assert outs[1].shape == (1, 4, 8, 8, 2)
    assert outs[2].shape == (1, 2, 4, 4, 2)


def test_ds_train_step(rng):
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH,
                     deep_supervision=True)
    img = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)).astype(np.float32))
    lab_lr = jnp.asarray((rng.normal(size=(2, 4, 16, 16, 1)) > 0).astype(np.float32))
    lab_hr = jnp.asarray((rng.normal(size=(2, 16, 16, 16, 1)) > 0).astype(np.float32))
    params = model.init(jax.random.key(0), img)
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 10, 5))
    state = TrainState.create(params, tx)
    step = make_seg_train_step(model, tx, enable_uncertainty=False,
                               enable_distillation=False,
                               deep_supervision=True, donate=False)
    batch = SegBatch(img, lab_lr, lab_hr, jnp.zeros_like(lab_lr))
    state, m = step(state, None, batch)
    assert np.isfinite(float(m["loss"]))
