"""Structural knowledge distillation between SR (teacher) and segmentation
(student) encoder features.

Capability parity with the reference models/seg_model.py:60-151: three
weighted terms on 64-channel feature maps —
  (a) structural: slice dim folded into batch, 2x2 max-pool to scale 0.5,
      channel-L2 normalization, pairwise similarity matrices via
      einsum('icm,icn->imn'), squared-error between teacher/student matrices;
  (b) 1x1x1-conv projection + smooth-L1;
  (c) cosine distance of channel-normalized features.

Layout: features are channels-last (B, S, H, W, C) (the reference uses
(B, C, S, H, W)); all math is einsum-native for the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _maxpool2d_ceil(x, kh: int, kw: int):
    """MaxPool2d(kernel=stride=(kh,kw), ceil_mode=True) on (N, H, W, C)."""
    n, h, w, c = x.shape
    ph = (-h) % kh
    pw = (-w) % kw
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, kh, kw, 1),
        padding="VALID",
    )


def _l2_channel(feat, eps: float = 1e-8):
    """Per-position channel L2 norm (reference L2(), seg_model.py:80-81)."""
    return jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True)) + eps


def similarity(feat):
    """Pairwise position-similarity matrix (seg_model.py:83-88).

    feat: (N, H, W, C) -> (N, M, M) with M = H*W.
    """
    feat = feat.astype(jnp.float32)
    feat = feat / jax.lax.stop_gradient(_l2_channel(feat))
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    return jnp.einsum("imc,inc->imn", flat, flat)


def sim_dis_compute(f_s, f_t):
    """(similarity(T) - similarity(S))^2 normalized (seg_model.py:90-93)."""
    n, h, w, _ = f_t.shape
    sim_err = (similarity(f_t) - similarity(f_s)) ** 2 / ((h * w) ** 2) / n
    return sim_err.sum()


def pairwise_loss_after_pool(feat_s, feat_t, scale: float = 0.5):
    """CriterionPairWiseforWholeFeatAfterPool (seg_model.py:95-113).

    feat: (B, S, H, W, C) — slice dim folds into batch, pool to `scale`.
    """
    b, s, h, w, cs = feat_s.shape
    ct = feat_t.shape[-1]
    fs = feat_s.reshape(b * s, h, w, cs)
    ft = jax.lax.stop_gradient(feat_t).reshape(b * s, h, w, ct)
    # reference pools with kernel (int(W*scale), int(H*scale)) — W/H swapped
    # relative to the feature dims, harmless for square maps; we keep (h, w).
    kh, kw = max(int(h * scale), 1), max(int(w * scale), 1)
    return sim_dis_compute(_maxpool2d_ceil(fs, kh, kw),
                           _maxpool2d_ceil(ft, kh, kw)) / s


def cosine_distance_loss(t1, t2):
    """Mean cosine distance over per-channel spatial vectors
    (seg_model.py:60-78). t: (B, S, H, W, C)."""
    t1 = t1 / _l2_channel(t1)
    t2 = t2 / _l2_channel(t2)
    b = t1.shape[0]
    c = t1.shape[-1]
    # (B, C, S*H*W): cosine similarity along the flattened spatial dim
    f1 = jnp.moveaxis(t1, -1, 1).reshape(b, c, -1)
    f2 = jnp.moveaxis(t2, -1, 1).reshape(b, c, -1)
    num = jnp.sum(f1 * f2, axis=2)
    den = jnp.linalg.norm(f1, axis=2) * jnp.linalg.norm(f2, axis=2)
    cos_sim = num / jnp.maximum(den, 1e-8)
    return jnp.mean(1.0 - cos_sim)


def smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < beta, 0.5 * diff ** 2 / beta,
                              diff - 0.5 * beta))


class Distiller(nn.Module):
    """KD module (seg_model.py:115-151): projection conv + weighted losses."""

    student_dim: int = 64
    teacher_dim: int = 64
    lambda_l1: float = 0.0
    lambda_cosine: float = 1.0
    lambda_structure: float = 1.0

    @nn.compact
    def __call__(self, feature_student, feature_teacher):
        loss = 0.0
        feature_teacher = jax.lax.stop_gradient(feature_teacher)
        if self.lambda_structure > 0:
            loss += self.lambda_structure * pairwise_loss_after_pool(
                feature_student, feature_teacher, scale=0.5)
        distilled = nn.Conv(self.teacher_dim, (1, 1, 1), use_bias=True,
                            name="distill")(feature_student)
        if self.lambda_l1 > 0:
            loss += self.lambda_l1 * smooth_l1(distilled, feature_teacher)
        if self.lambda_cosine > 0:
            loss += self.lambda_cosine * cosine_distance_loss(
                distilled, feature_teacher)
        return loss
