"""Optimizers and LR schedules (optax), matching the reference recipes.

  - Stage 1 (SR): Adam(betas=(0.9, 0.99)) + OneCycleLR over n_steps
    (reference train_all.py:282-289,359-366; torch OneCycleLR defaults:
    cosine anneal, pct_start 0.3, div_factor 25, final_div_factor 1e4).
    The curve is implemented directly rather than via
    optax.cosine_onecycle_schedule, which emits NaN for every step when
    transition_steps is tiny (its phase-interval size rounds to zero) —
    tiny smoke-test runs would silently train with a NaN learning rate.
  - Stage 2 (seg): SGD(momentum=0.99, nesterov, weight_decay=3e-5) with
    PolynomialLR stepped PER EPOCH (train_all.py:513-514,575) — torch
    PolynomialLR default power=1.0, so lr(e) = lr0 * (1 - e/total_iters).
"""

from __future__ import annotations

import optax


def cosine_onecycle_schedule(max_lr: float, total_steps: int,
                             pct_start: float = 0.3,
                             div_factor: float = 25.0,
                             final_div_factor: float = 1e4):
    """Torch-OneCycleLR-shaped schedule, safe for any total_steps >= 1:
    cosine ramp init_lr -> max_lr over pct_start*total, then cosine anneal
    max_lr -> final_lr over the remainder."""
    import jax.numpy as jnp

    total = max(float(total_steps), 1.0)
    warm = pct_start * total
    init_lr = max_lr / div_factor
    final_lr = init_lr / final_div_factor

    def _anneal(start, end, pct):
        return end + (start - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * pct))

    def sched(count):
        c = jnp.clip(jnp.asarray(count, jnp.float32), 0.0, total)
        pct_up = jnp.where(warm > 0, c / jnp.maximum(warm, 1e-9), 1.0)
        pct_down = (c - warm) / jnp.maximum(total - warm, 1e-9)
        up = _anneal(init_lr, max_lr, jnp.clip(pct_up, 0.0, 1.0))
        down = _anneal(max_lr, final_lr, jnp.clip(pct_down, 0.0, 1.0))
        return jnp.where(c < warm, up, down)

    return sched


def onecycle_adam(max_lr: float, total_steps: int,
                  betas=(0.9, 0.99)) -> optax.GradientTransformation:
    sched = cosine_onecycle_schedule(max_lr, total_steps)
    return optax.adam(sched, b1=betas[0], b2=betas[1]), sched


def poly_epoch_schedule(base_lr: float, total_epochs: int,
                        iters_per_epoch: int, power: float = 1.0):
    """PolynomialLR stepped once per epoch, expressed on the iteration axis."""
    import jax.numpy as jnp

    def sched(count):
        epoch = count // max(iters_per_epoch, 1)
        frac = 1.0 - jnp.minimum(epoch, total_epochs) / total_epochs
        return base_lr * frac ** power
    return sched


def nesterov_sgd(schedule, momentum: float = 0.99,
                 weight_decay: float = 3e-5) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: grad += wd * param BEFORE the momentum
    buffer update, nesterov lookahead."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=True),
        optax.scale_by_learning_rate(schedule),
    )


def sr_head_label_fn(params) -> dict:
    """Label each param subtree: 'sr_head' for the SR head, 'other' else
    (reference separate_weight_extensive_params, train_all.py:64-83)."""
    def label_tree(tree, path=()):
        if not isinstance(tree, dict):
            return "sr_head" if any("sr_head" in str(p) for p in path) else "other"
        return {k: label_tree(v, path + (k,)) for k, v in tree.items()}

    return label_tree(params)


def nesterov_sgd_grouped(base_lr: float, schedule,
                         momentum: float = 0.99,
                         weight_decay: float = 3e-5):
    """Per-group optimizer matching separate_weight_extensive_params
    (train_all.py:64-83, used when distillation is off at 510-513):
    `sr_head` params train at the full LR with weight decay; all other
    params at base_lr/10 with NO weight decay. `schedule` must be the
    full-LR schedule; the 'other' group scales it by 0.1.
    """
    import optax as _optax

    def scaled(s, factor):
        return lambda count: s(count) * factor

    sr_tx = nesterov_sgd(schedule, momentum, weight_decay)
    other_tx = _optax.chain(
        _optax.trace(decay=momentum, nesterov=True),
        _optax.scale_by_learning_rate(scaled(schedule, 0.1)),
    )
    return _optax.multi_transform(
        {"sr_head": sr_tx, "other": other_tx}, sr_head_label_fn)
