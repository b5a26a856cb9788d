"""Optimizers and LR schedules (optax), matching the reference recipes.

  - Stage 1 (SR): Adam(betas=(0.9, 0.99)) + OneCycleLR over n_steps
    (reference train_all.py:282-289,359-366; torch OneCycleLR defaults:
    cosine anneal, pct_start 0.3, div_factor 25, final_div_factor 1e4 —
    optax.cosine_onecycle_schedule implements exactly this curve).
  - Stage 2 (seg): SGD(momentum=0.99, nesterov, weight_decay=3e-5) with
    PolynomialLR stepped PER EPOCH (train_all.py:513-514,575) — torch
    PolynomialLR default power=1.0, so lr(e) = lr0 * (1 - e/total_iters).
"""

from __future__ import annotations

import optax


def onecycle_adam(max_lr: float, total_steps: int,
                  betas=(0.9, 0.99)) -> optax.GradientTransformation:
    sched = optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4)
    return optax.adam(sched, b1=betas[0], b2=betas[1]), sched


def poly_epoch_schedule(base_lr: float, total_epochs: int,
                        iters_per_epoch: int, power: float = 1.0):
    """PolynomialLR stepped once per epoch, expressed on the iteration axis."""
    def sched(count):
        epoch = count // max(iters_per_epoch, 1)
        frac = 1.0 - jnp_minimum(epoch, total_epochs) / total_epochs
        return base_lr * frac ** power
    return sched


def jnp_minimum(a, b):
    import jax.numpy as jnp
    return jnp.minimum(a, b)


def nesterov_sgd(schedule, momentum: float = 0.99,
                 weight_decay: float = 3e-5) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: grad += wd * param BEFORE the momentum
    buffer update, nesterov lookahead."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=True),
        optax.scale_by_learning_rate(schedule),
    )
