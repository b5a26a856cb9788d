"""Stage-1 SR training step (WDSR / FLAVR, with or without UASR uncertainty).

Parity with the reference `train_sr` inner loop (train_all.py:114-152):
  - HR target cropped to the center slice gap when num_slices > 1
    (train_all.py:122-123);
  - loss = L1(image) [+ heteroscedastic uncertainty terms] + BCEDice(label)
    (train_all.py:125-134).

TPU-first: one donated, jitted train step; batch shards over the mesh 'data'
axis, params replicate — XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..losses import sr_loss, sr_uncertainty_loss
from .state import TrainState


def crop_hr_target(patches_hr: jnp.ndarray, slice_separation: int,
                   num_slices: int) -> jnp.ndarray:
    """Center slice-gap crop (train_all.py:122-123). Layout (B, D, H, W, C)."""
    if num_slices <= 1:
        return patches_hr
    sep = int(slice_separation)
    lo = sep * (num_slices // 2 - 1)
    hi = sep * (num_slices // 2)
    return patches_hr[:, lo:hi]


def make_sr_train_step(model, tx: optax.GradientTransformation,
                       enable_uncertainty: bool, slice_separation: float,
                       num_slices: int, donate: bool = True,
                       precision: str | None = None) -> Callable:
    """Returns jitted step(state, patches_lr, patches_hr) -> (state, metrics).

    precision: 'bf16' runs the model forward/backward in bfloat16 against
    fp32 master weights (train.precision.Policy); losses and the optimizer
    update stay fp32. None/'fp32' is the exact reference-parity step.
    """
    from .precision import policy as _policy
    pol = _policy(precision)

    def loss_fn(params, patches_lr, patches_hr):
        target = crop_hr_target(patches_hr, int(slice_separation), num_slices)
        p = pol.cast_compute(params)
        x = pol.cast_compute(patches_lr)
        if enable_uncertainty:
            pred, uncertainty = model.apply(p, x)
            loss = sr_uncertainty_loss(pol.cast_reduce(pred),
                                       pol.cast_reduce(uncertainty), target)
        else:
            pred = model.apply(p, x)
            loss = sr_loss(pol.cast_reduce(pred), target)
        return loss

    def step(state: TrainState, patches_lr, patches_hr):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, patches_lr,
                                                  patches_hr)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": loss}

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
