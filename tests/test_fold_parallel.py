"""Fold-parallel training over the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.models import WDSR
from rehrseg_tpu.train import TrainState, onecycle_adam, make_sr_train_step
from rehrseg_tpu.parallel.fold_parallel import (
    make_fold_mesh, stack_fold_states, unstack_fold_state,
    make_fold_parallel_step, place_fold_batch, place_fold_state,
)


def test_fold_parallel_wdsr(rng):
    K = 4
    mesh = make_fold_mesh(K)  # (fold=4, data=2) over the 8 virtual devices
    model = WDSR(out_channel=2, n_resblocks=1, num_channels=8, scale=4.0)
    x0 = jnp.zeros((1, 8, 16, 2))
    tx, _ = onecycle_adam(1e-3, 10)

    states = []
    for k in range(K):
        params = model.init(jax.random.key(k), x0)
        states.append(TrainState.create(params, tx))
    stacked = place_fold_state(stack_fold_states(states), mesh)

    step = make_sr_train_step(model, tx, enable_uncertainty=False,
                              slice_separation=4, num_slices=1, donate=False)
    pstep = make_fold_parallel_step(step, mesh)

    lr = rng.normal(size=(K, 2, 8, 16, 2)).astype(np.float32)
    hr = rng.normal(size=(K, 2, 32, 16, 2)).astype(np.float32)
    batch = place_fold_batch((lr, hr), mesh)

    with mesh:
        stacked, metrics = pstep(stacked, *batch)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (K,)
    assert np.isfinite(losses).all()
    # folds are independent: different inits → different losses
    assert len(np.unique(losses.round(6))) > 1

    folds = unstack_fold_state(stacked, K)
    assert len(folds) == K
    assert int(np.asarray(folds[0].step)) == 1


def test_fold_parallel_none_teacher(rng):
    """enable_distillation=False passes flavr_params=None through the
    fold shard_map (None is an empty pytree; the per-fold step must see
    it unchanged)."""
    K = 4
    mesh = make_fold_mesh(K)
    model = WDSR(out_channel=2, n_resblocks=1, num_channels=8, scale=4.0)
    x0 = jnp.zeros((1, 8, 16, 2))
    tx, _ = onecycle_adam(1e-3, 10)
    states = [TrainState.create(model.init(jax.random.key(k), x0), tx)
              for k in range(K)]
    stacked = place_fold_state(stack_fold_states(states), mesh)
    base = make_sr_train_step(model, tx, enable_uncertainty=False,
                              slice_separation=4, num_slices=1, donate=False)

    def step(state, teacher, lr, hr):
        assert teacher is None  # trace-time: None must thread through
        return base(state, lr, hr)

    pstep = make_fold_parallel_step(step, mesh)
    lr = rng.normal(size=(K, 2, 8, 16, 2)).astype(np.float32)
    hr = rng.normal(size=(K, 2, 32, 16, 2)).astype(np.float32)
    batch = place_fold_batch((lr, hr), mesh)
    with mesh:
        stacked, metrics = pstep(stacked, None, *batch)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
