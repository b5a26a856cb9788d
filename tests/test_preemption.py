"""Preemption mid-stage: SIGTERM triggers a checkpoint save at the current
step, and a rerun resumes exactly there (VERDICT round-1 item 10;
SURVEY.md §5 failure-recovery axis)."""

import os
import signal

import numpy as np
import jax.numpy as jnp
import pytest

from rehrseg_tpu.models import WDSR
from rehrseg_tpu.train import TrainState, onecycle_adam, make_sr_train_step
from rehrseg_tpu.train import checkpoint as ckpt
from rehrseg_tpu.pipeline import _train_sr_loop
from rehrseg_tpu.utils.preemption import PreemptionGuard, TrainingPreempted


class _SignalingLoader:
    """Yields tiny SR batches; sends SIGTERM to this process at batch N."""

    def __init__(self, fire_at: int):
        self.count = 0
        self.fire_at = fire_at
        rng = np.random.default_rng(0)
        self.lr = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
        self.hr = rng.normal(size=(2, 32, 8, 2)).astype(np.float32)

    def next(self):
        self.count += 1
        if self.count == self.fire_at:
            os.kill(os.getpid(), signal.SIGTERM)
        return self.lr, self.hr

    def close(self):
        pass


def _setup(tmp_path, n_steps):
    model = WDSR(n_resblocks=1, num_channels=4, scale=4.0)
    params = model.init(__import__("jax").random.key(0),
                        jnp.zeros((1, 8, 8, 2)))
    tx, _ = onecycle_adam(1e-3, n_steps)
    state = TrainState.create(params, tx)
    step_fn = make_sr_train_step(model, tx, enable_uncertainty=False,
                                 slice_separation=4.0, num_slices=1)
    return model, tx, state, step_fn


def test_sigterm_saves_and_resumes(tmp_path):
    wdir = str(tmp_path / "ckpt")
    model, tx, state, step_fn = _setup(tmp_path, 10)

    # SIGTERM lands during batch 3 -> the NEXT iteration's poll saves+raises
    loader = _SignalingLoader(fire_at=3)
    with pytest.raises(TrainingPreempted) as ei:
        _train_sr_loop(model, tx, state, loader, step_fn, n_steps=10,
                       save_iters=100, weight_dir=wdir, log_every=1000)
    assert 1 <= ei.value.step < 10
    saved_step = ckpt.latest_step(wdir)
    assert saved_step == ei.value.step

    # resume: restore and finish the remaining steps untouched by signals
    state2 = TrainState.create(model.init(__import__("jax").random.key(0),
                                          jnp.zeros((1, 8, 8, 2))), tx)
    state2 = ckpt.restore_checkpoint(wdir, state2)
    assert int(state2.step) == saved_step
    loader2 = _SignalingLoader(fire_at=10_000)
    state3 = _train_sr_loop(model, tx, state2, loader2, step_fn, n_steps=10,
                            save_iters=100, weight_dir=wdir, log_every=1000)
    assert int(state3.step) == 10


def test_guard_restores_previous_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert signal.getsignal(signal.SIGTERM) is not before
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.should_stop
    assert signal.getsignal(signal.SIGTERM) is before
