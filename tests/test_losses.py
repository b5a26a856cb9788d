"""Loss parity tests, with independent torch oracles for CE/BCE formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from rehrseg_tpu.losses import (
    soft_dice_loss, robust_cross_entropy, dc_and_weighted_ce, build_seg_loss,
    dice_loss_sigmoid, bce_with_logits, bce_dice_loss,
    sr_loss, sr_uncertainty_loss, calculate_dice, deep_supervision_weights,
)


def _rand_logits_targets(rng, shape=(2, 4, 8, 8), num_classes=2):
    logits = rng.normal(size=shape + (num_classes,)).astype(np.float32)
    target = rng.integers(0, num_classes, size=shape + (1,)).astype(np.float32)
    return logits, target


def test_robust_ce_matches_torch(rng):
    logits, target = _rand_logits_targets(rng)
    ours = float(robust_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    lt = torch.from_numpy(logits.transpose(0, 4, 1, 2, 3))
    tt = torch.from_numpy(target[..., 0]).long()
    ref = TF.cross_entropy(lt, tt, reduction="none").mean().item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_robust_ce_uncertainty_weighting(rng):
    logits, target = _rand_logits_targets(rng)
    unc = rng.uniform(0.5, 1.0, size=target.shape).astype(np.float32)
    ours = float(robust_cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                                      jnp.asarray(unc)))
    lt = torch.from_numpy(logits.transpose(0, 4, 1, 2, 3))
    tt = torch.from_numpy(target[..., 0]).long()
    ref = (TF.cross_entropy(lt, tt, reduction="none")
           * torch.from_numpy(unc[..., 0])).mean().item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_soft_dice_perfect_prediction(rng):
    _, target = _rand_logits_targets(rng)
    # logits strongly favoring the target class
    onehot = np.eye(2, dtype=np.float32)[target[..., 0].astype(int)]
    logits = (onehot * 2 - 1) * 20.0
    loss = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert loss == pytest.approx(-1.0, abs=1e-3)


def test_soft_dice_nnunet_semantics(rng):
    """Manual formula check: softmax fg channel, per-sample dice, -mean."""
    logits, target = _rand_logits_targets(rng, shape=(3, 4, 4, 4))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    fg = probs[..., 1]
    t = target[..., 0]
    axes = (1, 2, 3)
    inter = (fg * t).sum(axes)
    dc = (2 * inter + 1e-5) / np.clip(fg.sum(axes) + t.sum(axes) + 1e-5, 1e-8, None)
    expected = -dc.mean()
    got = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_dc_and_weighted_ce_weight_dice_zero(rng):
    logits, target = _rand_logits_targets(rng)
    full = float(dc_and_weighted_ce(jnp.asarray(logits), jnp.asarray(target),
                                    weight_dice=0))
    ce = float(robust_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    assert full == pytest.approx(ce, rel=1e-6)


def test_build_seg_loss_deep_supervision(rng):
    weights = deep_supervision_weights(4)
    assert weights[-1] == 0
    assert weights.sum() == pytest.approx(1.0)
    loss_fn = build_seg_loss(enable_deep_supervision=True)
    shapes = [(2, 4, 8, 8), (2, 4, 4, 4), (2, 2, 2, 2), (2, 1, 1, 1)]
    logits = [jnp.asarray(rng.normal(size=s + (2,)).astype(np.float32)) for s in shapes]
    targets = [jnp.asarray(rng.integers(0, 2, size=s + (1,)).astype(np.float32))
               for s in shapes]
    val = float(loss_fn(logits, targets))
    assert np.isfinite(val)


def test_bce_matches_torch(rng):
    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 8, 8, 1)).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    ref = TF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_dice_loss_sigmoid_formula(rng):
    """V-Net style: squared denominator, per-channel over whole batch."""
    logits = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 4, 4, 1)).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    pf, tf_ = p.reshape(-1), target.reshape(-1)
    dice = 2 * (pf * tf_).sum() / np.clip((pf * pf).sum() + (tf_ * tf_).sum(),
                                          1e-6, None)
    expected = 1 - dice
    got = float(dice_loss_sigmoid(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_bce_dice_combination(rng):
    logits = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 4, 4, 1)).astype(np.float32)
    a = float(bce_dice_loss(jnp.asarray(logits), jnp.asarray(target), 1.0, 1.0))
    b = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    d = float(dice_loss_sigmoid(jnp.asarray(logits), jnp.asarray(target)))
    assert a == pytest.approx(b + d, rel=1e-6)


def test_sr_loss_components(rng):
    pred = rng.normal(size=(2, 4, 8, 8, 2)).astype(np.float32)
    target = rng.normal(size=(2, 4, 8, 8, 2)).astype(np.float32)
    target[..., 1] = (target[..., 1] > 0).astype(np.float32)
    v = float(sr_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert np.isfinite(v) and v > 0


def test_sr_uncertainty_loss_grads(rng):
    pred = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 2)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 2)).astype(np.float32))
    unc = jnp.asarray(rng.uniform(0.2, 0.9, size=(1, 4, 8, 8, 1)).astype(np.float32))

    def f(p, u):
        return sr_uncertainty_loss(p, u, target)
    val, grads = jax.value_and_grad(f, argnums=(0, 1))(pred, unc)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_calculate_dice_binary():
    p = np.array([1, 1, 0, 0], dtype=np.uint8)
    g = np.array([1, 0, 1, 0], dtype=np.uint8)
    assert calculate_dice(p, g) == pytest.approx((2 * 1 + 1e-5) / (2 + 2 + 1e-5))


def test_psnr():
    from rehrseg_tpu.losses import calculate_psnr
    x = np.linspace(0, 1, 1000).reshape(10, 10, 10)
    assert calculate_psnr(x, x) == float("inf")
    noisy = x + 0.01
    # MSE = 1e-4, range 1 → PSNR = 40 dB
    assert calculate_psnr(noisy, x, data_range=1.0) == pytest.approx(40.0, abs=0.1)


def test_robust_ce_matches_gather_semantics(rng):
    """The fast masked select-sum CE (losses.py — the TPU gather
    replacement) must match take_along_axis semantics exactly, INCLUDING
    non-finite logits: a -inf log-prob on a class the label does not
    select must not poison the loss (0 * -inf = NaN under the naive
    one-hot multiply form)."""
    from rehrseg_tpu.losses import robust_cross_entropy

    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    target = rng.integers(0, 3, size=(2, 4, 4, 1)).astype(np.float32)
    got = robust_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ref = -jnp.take_along_axis(
        logp, jnp.asarray(target).astype(jnp.int32), axis=-1)[..., 0]
    np.testing.assert_allclose(float(got), float(jnp.mean(ref)), rtol=1e-6)

    # saturate one non-selected class to -inf-producing logits: the label
    # never picks class 2, so the loss must stay finite (gather parity)
    logits2 = logits.copy()
    logits2[..., 2] = -1e30          # log_softmax -> -inf for class 2
    target2 = np.minimum(target, 1.0)
    got2 = robust_cross_entropy(jnp.asarray(logits2), jnp.asarray(target2))
    assert np.isfinite(float(got2))


def test_sr_uncertainty_loss_single_channel(rng):
    """sr_mode='img' (1-channel SR) + UASR head: no label channel means no
    BCEDice term — an empty [..., 1:] slice would NaN the whole loss."""
    pred = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 1)).astype(np.float32))
    unc = jnp.asarray(
        rng.uniform(0.2, 0.9, size=(1, 4, 8, 8, 1)).astype(np.float32))
    val, grads = jax.value_and_grad(
        lambda p, u: sr_uncertainty_loss(p, u, target), argnums=(0, 1))(
            pred, unc)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
