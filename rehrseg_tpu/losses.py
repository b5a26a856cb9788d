"""Segmentation and super-resolution losses.

Behavioral parity with the reference loss zoo
(/root/reference/utils/seg_utils.py:289-372,786-886 and the inline SR loss in
train_all.py:125-134), reimplemented channels-last for NDHWC tensors:

  - ``soft_dice_loss``: nnunetv2 MemoryEfficientSoftDiceLoss semantics
    (softmax nonlin, batch_dice=False, do_bg=False, smooth=1e-5; returns the
    NEGATIVE mean dice, as nnUNet does).
  - ``robust_cross_entropy``: CE on logits with float (B,...,1) targets and
    optional per-voxel uncertainty weighting (seg_utils.py:289-303).
  - ``dc_and_weighted_ce``: weight_ce * CE + weight_dice * (-dice)
    (seg_utils.py:305-353).
  - ``build_seg_loss``: the `_build_loss` factory incl. deep supervision
    weights (seg_utils.py:355-372).
  - ``bce_dice_loss`` / ``dice_loss_sigmoid``: stage-1 label-channel loss
    (seg_utils.py:786-886; per-channel dice over the whole batch with squared
    denominator and eps=1e-6 clamp).
  - ``sr_loss`` / ``sr_uncertainty_loss``: stage-1 image losses incl. the
    heteroscedastic |err|/u + log u term and L1 supervision of the
    uncertainty map (train_all.py:125-134).
  - ``calculate_dice``: the binary evaluation metric (seg_utils.py:730-734).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- dice

def soft_dice_loss(logits, target, smooth: float = 1e-5, do_bg: bool = False,
                   batch_dice: bool = False):
    """Negative soft dice with softmax nonlinearity.

    logits: (B, *spatial, C); target: (B, *spatial, 1) float class indices or
    (B, *spatial, C) one-hot.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    num_classes = logits.shape[-1]
    if target.shape == logits.shape:
        y_onehot = target
    else:
        y_onehot = jax.nn.one_hot(target[..., 0].astype(jnp.int32), num_classes,
                                  dtype=probs.dtype)
    if not do_bg:
        probs = probs[..., 1:]
        y_onehot = y_onehot[..., 1:]
    spatial_axes = tuple(range(1, probs.ndim - 1))
    intersect = jnp.sum(probs * y_onehot, axis=spatial_axes)
    sum_pred = jnp.sum(probs, axis=spatial_axes)
    sum_gt = jnp.sum(y_onehot, axis=spatial_axes)
    if batch_dice:
        intersect = intersect.sum(0)
        sum_pred = sum_pred.sum(0)
        sum_gt = sum_gt.sum(0)
    dc = (2.0 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth,
                                               min=1e-8)
    return -jnp.mean(dc)


def robust_cross_entropy(logits, target, uncertainty=None):
    """CE on logits with float targets; optional per-voxel weights, then mean."""
    if target.ndim == logits.ndim:
        target = target[..., 0]
    labels = target.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # Select the label-class log-prob as a masked select-sum rather than
    # take_along_axis: XLA lowers that gather (and its scatter transpose in
    # the backward) to a ~1.7 GB/s serial loop on TPU — it alone was 42% of
    # the stage-2 train step (docs/BENCHMARKS.md round-4 op profile). The
    # where-form fuses to elementwise ops at HBM bandwidth both ways and
    # keeps exact gather semantics even for non-finite logits (a one-hot
    # MULTIPLY would turn any -inf log-prob into NaN via 0 * -inf).
    classes = jnp.arange(logp.shape[-1], dtype=labels.dtype)
    mask = labels[..., None] == classes
    nll = -jnp.sum(jnp.where(mask, logp, jnp.zeros_like(logp)), axis=-1)
    if uncertainty is not None:
        if uncertainty.ndim == nll.ndim + 1:
            uncertainty = uncertainty[..., 0]
        nll = nll * uncertainty
    return jnp.mean(nll)


def dc_and_weighted_ce(logits, target, uncertainty=None, weight_ce: float = 1.0,
                       weight_dice: float = 1.0, smooth: float = 1e-5):
    dc = soft_dice_loss(logits, target, smooth=smooth) if weight_dice != 0 else 0.0
    ce = robust_cross_entropy(logits, target, uncertainty) if weight_ce != 0 else 0.0
    return weight_ce * ce + weight_dice * dc


def deep_supervision_weights(n_scales: int) -> np.ndarray:
    """Exponentially decaying weights, last zeroed, normalized
    (seg_utils.py:363-370)."""
    weights = np.array([1.0 / (2 ** i) for i in range(n_scales)])
    weights[-1] = 0.0
    return weights / weights.sum()


def build_seg_loss(enable_deep_supervision: bool = False, weight_dice: float = 1.0):
    """Factory mirroring `_build_loss` (seg_utils.py:355-372)."""
    def single(logits, target, uncertainty=None):
        return dc_and_weighted_ce(logits, target, uncertainty,
                                  weight_ce=1.0, weight_dice=weight_dice)

    if not enable_deep_supervision:
        return single

    def ds(logits_list, target_list, uncertainty=None):
        weights = deep_supervision_weights(len(logits_list))
        total = 0.0
        for w, lg, tg in zip(weights, logits_list, target_list):
            if w == 0.0:
                continue
            total = total + w * single(lg, tg, uncertainty)
        return total

    return ds


# ------------------------------------------------------------ stage-1 losses

def _flatten_channel_first(x):
    """(B, *spatial, C) -> (C, B*prod(spatial)); dice per channel over batch."""
    c = x.shape[-1]
    return jnp.moveaxis(x, -1, 0).reshape(c, -1)


def dice_loss_sigmoid(logits, target, epsilon: float = 1e-6):
    """DiceLoss with sigmoid normalization and squared denominator
    (seg_utils.py:786-873)."""
    probs = jax.nn.sigmoid(logits)
    p = _flatten_channel_first(probs)
    t = _flatten_channel_first(target).astype(p.dtype)
    intersect = jnp.sum(p * t, axis=-1)
    denominator = jnp.sum(p * p, axis=-1) + jnp.sum(t * t, axis=-1)
    per_channel = 2.0 * intersect / jnp.clip(denominator, min=epsilon)
    return 1.0 - jnp.mean(per_channel)


def bce_with_logits(logits, target):
    return jnp.mean(jnp.maximum(logits, 0) - logits * target +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def bce_dice_loss(logits, target, alpha: float = 1.0, beta: float = 1.0):
    """BCEDiceLoss (seg_utils.py:875-886)."""
    return alpha * bce_with_logits(logits, target) + beta * dice_loss_sigmoid(
        logits, target)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def sr_loss(pred, target, alpha: float = 1.0, beta: float = 1.0):
    """Stage-1 loss without uncertainty (train_all.py:132-134):
    L1 on channel 0 (image) + BCEDice on remaining (label) channels."""
    img_l1 = l1_loss(pred[..., 0:1], target[..., 0:1])
    if pred.shape[-1] == 1:
        # sr_mode='img' single-channel SR: no label channel to supervise
        return img_l1
    seg = bce_dice_loss(pred[..., 1:], target[..., 1:], alpha, beta)
    return img_l1 + seg


def sr_uncertainty_loss(pred, uncertainty, target, alpha: float = 1.0,
                        beta: float = 1.0):
    """Stage-1 loss with UASR head (train_all.py:125-134):
    L1(img) + mean(|err|/u + log u) + L1(u, |err|.detach) + BCEDice(label)."""
    err = pred[..., 0:1] - target[..., 0:1]
    loss = l1_loss(pred[..., 0:1], target[..., 0:1])
    loss += jnp.mean(jnp.abs(err) / uncertainty + jnp.log(uncertainty))
    error_map = jax.lax.stop_gradient(jnp.abs(err))
    loss += l1_loss(uncertainty, error_map)
    if pred.shape[-1] == 1:
        # sr_mode='img' single-channel SR: no label channel to supervise
        # (an empty [..., 1:] slice would mean a NaN from a zero-size mean)
        return loss
    loss += bce_dice_loss(pred[..., 1:], target[..., 1:], alpha, beta)
    return loss


# -------------------------------------------------------------- eval metric

def calculate_dice(prediction, ground_truth, smooth: float = 1e-5) -> float:
    prediction = np.asarray(prediction).flatten()
    ground_truth = np.asarray(ground_truth).flatten()
    intersection = np.sum(prediction * ground_truth)
    return float((2.0 * intersection + smooth) /
                 (np.sum(prediction) + np.sum(ground_truth) + smooth))


def calculate_psnr(prediction, ground_truth, data_range: float | None = None) -> float:
    """Peak signal-to-noise ratio (dB) — the SR quality headline metric
    (BASELINE.md: 'Dice & PSNR parity on Meningioma')."""
    prediction = np.asarray(prediction, dtype=np.float64)
    ground_truth = np.asarray(ground_truth, dtype=np.float64)
    if data_range is None:
        data_range = float(ground_truth.max() - ground_truth.min())
    mse = np.mean((prediction - ground_truth) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))
