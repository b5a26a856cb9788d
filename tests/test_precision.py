"""Mixed-precision (bf16 compute / fp32 master) training-step parity.

The bf16 policy must (a) keep params + optimizer state fp32, (b) produce
losses/grads that agree with the exact fp32 step to bf16 tolerance, and
(c) actually run the matmul path in bf16 (checked structurally via the
policy's casts). Reference has no analogue — torch fp32 throughout
(train_all.py:114-152, 519-556)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rehrseg_tpu.models import WDSR, UNet3D, SegModel, Distiller
from rehrseg_tpu.train import (TrainState, onecycle_adam, nesterov_sgd,
                               poly_epoch_schedule, make_sr_train_step,
                               make_seg_train_step, SegBatch)
from rehrseg_tpu.train.precision import policy, Policy


ARCH = dict(
    n_stages=3,
    features_per_stage=(4, 8, 8),
    kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3)),
    strides=((1, 1, 1), (1, 2, 2), (2, 2, 2)),
    n_conv_per_stage=(1, 1, 1),
    n_conv_per_stage_decoder=(1, 1),
    conv_bias=True, norm_eps=1e-5, norm_affine=True, nonlin_slope=0.01,
)


def test_policy_resolution():
    assert policy(None).is_identity
    assert policy("fp32").is_identity
    p = policy("bf16")
    assert p.compute_dtype == jnp.bfloat16
    assert policy(p) is p
    with pytest.raises(ValueError):
        policy("fp8")


def test_policy_casts_inexact_only():
    p = policy("bf16")
    tree = {"w": jnp.ones((2,), jnp.float32), "idx": jnp.ones((2,), jnp.int32)}
    out = p.cast_compute(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == jnp.int32


def _leaves_dtypes(tree):
    return {t.dtype for t in jax.tree_util.tree_leaves(tree)
            if jnp.issubdtype(t.dtype, jnp.inexact)}


def test_sr_step_bf16_matches_fp32(rng):
    model = WDSR(out_channel=2, n_resblocks=2, num_channels=8, scale=4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 32, 8, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    tx, _ = onecycle_adam(1e-3, 10)

    outs = {}
    for prec in ("fp32", "bf16"):
        state = TrainState.create(params, tx)
        step = make_sr_train_step(model, tx, enable_uncertainty=False,
                                  slice_separation=4, num_slices=1,
                                  donate=False, precision=prec)
        new_state, metrics = step(state, x, y)
        # master params stay fp32 under both policies
        assert _leaves_dtypes(new_state.params) == {jnp.dtype(jnp.float32)}
        outs[prec] = (float(metrics["loss"]), new_state.params)

    l32, p32 = outs["fp32"]
    l16, p16 = outs["bf16"]
    assert l16 == pytest.approx(l32, rel=2e-2)
    v32 = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(p32)])
    v16 = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(p16)])
    rel = np.linalg.norm(v32 - v16) / np.linalg.norm(v32)
    assert rel < 2e-2, rel


@pytest.mark.heavy
def test_seg_step_bf16_matches_fp32_with_kd(rng):
    """Full stage-2 step (dual loss + uncertainty weighting + KD teacher)
    under the bf16 policy vs fp32, packed+remat path."""
    seg = SegModel(num_classes=2, upscale=4, input_channels=1, arch=ARCH)
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=False)
    dist = Distiller(student_dim=ARCH["features_per_stage"][1],
                     teacher_dim=64, lambda_l1=0.0, lambda_cosine=1.0,
                     lambda_structure=1.0)

    img = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32))
    llr = jnp.asarray((rng.random((1, 4, 16, 16, 1)) > .5).astype(np.float32))
    lhr = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > .5).astype(np.float32))
    unc = jnp.asarray(rng.random((1, 4, 16, 16, 1)).astype(np.float32))
    batch = SegBatch(img, llr, lhr, unc)

    seg_params = seg.init(jax.random.key(0), img)
    fparams = flavr.init(jax.random.key(1), jnp.zeros((1, 4, 16, 16, 2)))
    dparams = dist.init(jax.random.key(2),
                        jnp.zeros((1, 2, 8, 8, ARCH["features_per_stage"][1])),
                        jnp.zeros((1, 2, 8, 8, 64)))
    params = {"seg": seg_params, "distiller": dparams}
    sched = poly_epoch_schedule(1e-3, 2, 5)
    tx = nesterov_sgd(sched)

    outs = {}
    for prec in ("fp32", "bf16"):
        state = TrainState.create(params, tx)
        step = make_seg_train_step(
            seg, tx, enable_uncertainty=True, enable_distillation=True,
            flavr_model=flavr, distiller=dist, donate=False, precision=prec)
        new_state, metrics = step(state, fparams, batch)
        assert _leaves_dtypes(new_state.params) == {jnp.dtype(jnp.float32)}
        assert np.isfinite(float(metrics["loss"]))
        outs[prec] = (metrics, new_state.params)

    m32, p32 = outs["fp32"]
    m16, p16 = outs["bf16"]
    for k in ("loss", "loss_lr", "loss_hr", "loss_kd"):
        assert float(m16[k]) == pytest.approx(float(m32[k]), rel=5e-2), k
    v32 = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(p32)])
    v16 = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(p16)])
    rel = np.linalg.norm(v32 - v16) / np.linalg.norm(v32)
    assert rel < 5e-2, rel


@pytest.mark.heavy
def test_bf16_uasr_sr_step_finite(rng):
    """The heteroscedastic uncertainty loss divides by the (bf16-produced)
    uncertainty map — must stay finite under the policy."""
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    tx, _ = onecycle_adam(1e-3, 10)
    state = TrainState.create(params, tx)
    step = make_sr_train_step(model, tx, enable_uncertainty=True,
                              slice_separation=4, num_slices=4,
                              donate=False, precision="bf16")
    _, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))
