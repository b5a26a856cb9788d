"""segmodel_apply_packed must reproduce SegModel.apply exactly (float
tolerance) — it's the same network in a different memory layout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rehrseg_tpu.models import SegModel
from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed


ARCH_SMALL = dict(
    n_stages=4,
    features_per_stage=(8, 16, 32, 32),
    kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    strides=((1, 1, 1), (1, 2, 2), (2, 2, 2), (1, 2, 2)),
    n_conv_per_stage=(2, 2, 2, 2),
    n_conv_per_stage_decoder=(2, 2, 2),
    conv_bias=True, norm_eps=1e-5, norm_affine=True, nonlin_slope=0.01,
)


def _setup(arch, rng, shape=(2, 8, 32, 48, 1)):
    model = SegModel(num_classes=2, upscale=4, arch=dict(arch))
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    params = model.init(jax.random.key(0), x[:1])
    # non-trivial norm affine + biases so layout bugs can't hide
    params = jax.tree.map(
        lambda a: a + 0.05 * np.random.default_rng(a.size).standard_normal(
            a.shape).astype(a.dtype), params)
    return model, params, x


@pytest.mark.parametrize("pack_max", [0, 16, 64])
def test_packed_matches_reference_lr(rng, pack_max):
    """pack_max=0 exercises the all-standard functional path; 16/64 pack
    progressively more stages. All must equal SegModel.apply."""
    model, params, x = _setup(ARCH_SMALL, rng)
    ref_lr, _ = model.apply(params, x)
    got_lr = segmodel_apply_packed(ARCH_SMALL, params, x,
                                   pack_max_channels=pack_max)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)


def test_packed_matches_reference_dual(rng):
    model, params, x = _setup(ARCH_SMALL, rng)
    ref_lr, ref_hr = model.apply(params, x)
    got_lr, got_hr = segmodel_apply_packed(
        ARCH_SMALL, params, x, pack_max_channels=64, dual=True, upscale=4)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_matches_under_jit_bf16(rng):
    """The eval path runs jitted in bf16: packed and unpacked must agree to
    bf16 tolerance there too (same math, same dtype)."""
    model, params, x = _setup(ARCH_SMALL, rng)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x16 = x.astype(jnp.bfloat16)

    ref = jax.jit(lambda p, b: model.apply(p, b)[0])(params16, x16)
    got = jax.jit(lambda p, b: segmodel_apply_packed(
        ARCH_SMALL, p, b, pack_max_channels=64))(params16, x16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.15)


def test_packed_odd_spatial_falls_back(rng):
    """Stages whose in-plane dims go odd can't pack (here stage 3 at 5x7) —
    those fall back to the standard path and the forward stays exact.
    (Dims must still satisfy nnUNet's stride divisibility, which real
    plans.json patches guarantee.)"""
    model, params, x = _setup(ARCH_SMALL, rng, shape=(1, 8, 40, 56, 1))
    ref_lr, _ = model.apply(params, x)
    got_lr = segmodel_apply_packed(ARCH_SMALL, params, x,
                                   pack_max_channels=64)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)


def test_packed_engine_labels_match_unpacked(rng):
    """Through the full sliding-window engine (gaussian + mirror TTA +
    argmax), packed and unpacked forwards produce identical label maps."""
    from rehrseg_tpu.infer.sliding_window import predict_sliding_window_labels

    model = SegModel(num_classes=2, upscale=4, arch=dict(ARCH_SMALL))
    x0 = jnp.zeros((1, 8, 32, 32, 1))
    params = model.init(jax.random.key(0), x0)
    vol = rng.normal(size=(10, 40, 48, 1)).astype(np.float32)

    def lr_std(p, b):
        return model.apply(p, b)[0]

    def lr_packed(p, b):
        return segmodel_apply_packed(ARCH_SMALL, p, b, pack_max_channels=64)

    std = predict_sliding_window_labels(lr_std, params, vol, (8, 32, 32),
                                        mirror=True, input_dtype=jnp.float32)
    packed = predict_sliding_window_labels(lr_packed, params, vol,
                                           (8, 32, 32), mirror=True,
                                           input_dtype=jnp.float32)
    assert np.array_equal(std, packed)


def test_packed_mixed_dtypes_promote_like_flax(rng):
    """bf16 batch x fp32 params (evaluate() mid-training) must promote to
    fp32 like flax instead of raising."""
    model, params, x = _setup(ARCH_SMALL, rng)
    out = segmodel_apply_packed(ARCH_SMALL, params,
                                x.astype(jnp.bfloat16),
                                pack_max_channels=64)
    assert out.dtype == jnp.float32
    ref, _ = model.apply(params, x.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.15)


def test_packed_train_step_matches_standard(rng):
    """The packed forward drives the TRAINING step too: loss and updated
    params must match the standard step to float tolerance."""
    from rehrseg_tpu.train import (TrainState, nesterov_sgd,
                                   make_seg_train_step, SegBatch)
    from rehrseg_tpu.train.optim import poly_epoch_schedule

    model = SegModel(num_classes=2, upscale=4, arch=dict(ARCH_SMALL))
    b, d, h, w, sep = 2, 8, 32, 48, 4
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * sep, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)
    batch = SegBatch(*[jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)])

    params = model.init(jax.random.key(0), jnp.asarray(img[:1]))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 10, 5))

    outs = {}
    for packed in (False, True):
        step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                   enable_distillation=False,
                                   donate=False, packed=packed)
        state = TrainState.create(params, tx)
        new_state, metrics = step(state, None, batch)
        outs[packed] = (float(metrics["loss"]),
                        jax.tree_util.tree_leaves(new_state.params))

    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-4)
    for a, b_ in zip(outs[False][1], outs[True][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=1e-5)


@pytest.mark.heavy
def test_packed_remat_exact(rng):
    """remat recomputes — outputs and gradients are identical."""
    model, params, x = _setup(ARCH_SMALL, rng, shape=(1, 8, 32, 48, 1))

    def loss(p, r):
        lr, hr = segmodel_apply_packed(ARCH_SMALL, p, x, dual=True,
                                       upscale=4, remat=r)
        return jnp.sum(lr ** 2) + jnp.sum(hr ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    # recomputation reorders fp32 reductions; a few norm-affine leaves have
    # structurally cancelling gradients (millions of near-cancelling voxel
    # terms) where elementwise comparison measures only the noise floor —
    # compare the GLOBAL gradient vector instead (train-step equivalence
    # incl. remat is separately pinned by
    # test_packed_train_step_matches_standard)
    v0 = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(g0)])
    v1 = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(g1)])
    rel = np.linalg.norm(v0 - v1) / np.linalg.norm(v0)
    assert rel < 1e-3, rel


def test_packed_three_convs_per_stage(rng):
    """n_conv_per_stage=3 walks the full parity cycle u->o->a->o: stages
    end OFFSET and every consumer (strided conv, decoder concat fallback,
    seg head) must still be exact."""
    arch = dict(ARCH_SMALL, n_conv_per_stage=(3, 3, 3, 3),
                n_conv_per_stage_decoder=(3, 3, 3))
    model, params, x = _setup(arch, rng, shape=(1, 8, 32, 48, 1))
    ref_lr, ref_hr = model.apply(params, x)
    got_lr, got_hr = segmodel_apply_packed(arch, params, x,
                                           pack_max_channels=64, dual=True,
                                           upscale=4)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_unusual_strides_fall_back(rng):
    """Strides the packed dispatch doesn't implement — D-only (2,1,1) and a
    (1,3,3) kernel paired with a full (2,2,2) stride — must route to the
    standard path (not silently drop the D stride). Regression for the
    round-2 advisor finding."""
    arch = dict(
        ARCH_SMALL,
        kernel_sizes=((1, 3, 3), (1, 3, 3), (1, 3, 3), (3, 3, 3)),
        strides=((1, 1, 1), (2, 1, 1), (2, 2, 2), (1, 2, 2)),
    )
    model, params, x = _setup(arch, rng, shape=(1, 8, 32, 48, 1))
    ref_lr, ref_hr = model.apply(params, x)
    got_lr, got_hr = segmodel_apply_packed(arch, params, x,
                                           pack_max_channels=64, dual=True,
                                           upscale=4)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_dual_three_classes(rng):
    """num_classes=3 exercises the cell4z2 output layout's (group, class)
    interleave (channels c::ncl) with a non-power-of-two class count —
    layout bugs in the z2/cell4 slicing can't hide behind ncl=2."""
    model = SegModel(num_classes=3, upscale=4, arch=dict(ARCH_SMALL))
    x = jnp.asarray(rng.normal(size=(1, 8, 32, 48, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    params = jax.tree.map(
        lambda a: a + 0.05 * np.random.default_rng(a.size).standard_normal(
            a.shape).astype(a.dtype), params)
    ref_lr, ref_hr = model.apply(params, x)
    got_lr, got_hr = segmodel_apply_packed(
        ARCH_SMALL, params, x, num_classes=3, pack_max_channels=64,
        dual=True, upscale=4)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("form", ["auto", "cell4", "legacy"])
def test_packed_dual_sr_head_forms_match(rng, form):
    """Every sr_head_form emission ('auto' fused+z2, 'cell4', 'legacy'
    round-3) is the same math — all must equal the unpacked dual head.
    The training step selects a form for peak-HBM reasons
    (experiments/stage2_head_mem.py), so each must stay exact."""
    model, params, x = _setup(ARCH_SMALL, rng)
    ref_lr, ref_hr = model.apply(params, x)
    got_lr, got_hr = segmodel_apply_packed(
        ARCH_SMALL, params, x, pack_max_channels=64, dual=True, upscale=4,
        sr_head_form=form)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_train_step_head_form_loss_parity(rng):
    """The training step's loss is form-invariant (same forward math)."""
    from rehrseg_tpu.train import (TrainState, nesterov_sgd,
                                   make_seg_train_step, SegBatch)
    from rehrseg_tpu.train.optim import poly_epoch_schedule

    model = SegModel(num_classes=2, upscale=4, arch=dict(ARCH_SMALL))
    b, d, h, w, sep = 2, 8, 32, 48, 4
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * sep, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)
    batch = SegBatch(*[jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)])
    params = model.init(jax.random.key(0), jnp.asarray(img[:1]))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 10, 5))

    losses = {}
    for form in ("auto", "cell4", "legacy"):
        step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                   enable_distillation=False,
                                   donate=False, packed=True,
                                   sr_head_form=form)
        state = TrainState.create(params, tx)
        _, metrics = step(state, None, batch)
        losses[form] = float(metrics["loss"])
    assert losses["auto"] == pytest.approx(losses["cell4"], rel=1e-4)
    assert losses["auto"] == pytest.approx(losses["legacy"], rel=1e-4)


def test_packed_pallas_conv_matches_reference(rng):
    """pallas_conv=True routes covered stride-1 packed convs through the
    ops.pallas_pconv kernels (interpret mode on CPU) with offset tensors
    stored at 8-aligned widths; must still equal SegModel.apply exactly —
    including stages whose widths force the XLA fallbacks."""
    model, params, x = _setup(ARCH_SMALL, rng)
    ref_lr, ref_hr = model.apply(params, x)
    got_lr, got_hr = segmodel_apply_packed(
        ARCH_SMALL, params, x, pack_max_channels=64, dual=True, upscale=4,
        pallas_conv=True)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_pallas_cat_matches_reference(rng):
    """pallas_conv="cat" fuses ONLY the decoder skip concat into
    pconv_pad11_cat (never materializing the concatenated tensor); must
    equal SegModel.apply exactly, and the kernel must actually engage at
    covered channel counts — not silently fall back."""
    import rehrseg_tpu.ops.pallas_pconv as pp

    # 32-feature full-res stage -> 128+128 packed lanes (kernel-covered)
    arch = dict(ARCH_SMALL, features_per_stage=(32, 32, 32, 32))
    model, params, x = _setup(arch, rng)
    ref_lr, ref_hr = model.apply(params, x)

    engaged = []
    orig = pp.pconv_pad11_cat

    def spy(*a, **k):
        y = orig(*a, **k)
        engaged.append(y is not None)
        return y

    pp.pconv_pad11_cat = spy
    try:
        got_lr, got_hr = segmodel_apply_packed(
            arch, params, x, pack_max_channels=64, dual=True, upscale=4,
            pallas_conv="cat")
    finally:
        pp.pconv_pad11_cat = orig
    assert any(engaged), "cat kernel never engaged (silent fallback)"
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_pallas_cat_uncovered_arch_falls_back(rng):
    """At channel counts the kernel doesn't cover (8/16 features), "cat"
    must be a pure no-op vs the XLA packed path."""
    model, params, x = _setup(ARCH_SMALL, rng)
    base = segmodel_apply_packed(ARCH_SMALL, params, x,
                                 pack_max_channels=64)
    cat = segmodel_apply_packed(ARCH_SMALL, params, x,
                                pack_max_channels=64, pallas_conv="cat")
    np.testing.assert_allclose(np.asarray(cat), np.asarray(base),
                               rtol=0, atol=0)


def test_packed_pallas_cat_plane_out(rng):
    """cat mode + plane_out (the aligned-engine emission)."""
    arch = dict(ARCH_SMALL, features_per_stage=(32, 32, 32, 32))
    model, params, x = _setup(arch, rng)
    base = segmodel_apply_packed(arch, params, x, pack_max_channels=64)
    planes = segmodel_apply_packed(arch, params, x, pack_max_channels=64,
                                   plane_out=True, pallas_conv="cat")
    np.testing.assert_allclose(
        np.asarray(planes), np.asarray(jnp.moveaxis(base, -1, 1)),
        rtol=2e-4, atol=2e-4)


def _fused_spies(pp, engaged):
    orig = (pp.pconv_pad11_cat, pp.pconv_valid, pp.pconv3_valid)

    def spy_cat(*a, **k):
        r = orig[0](*a, **k)
        engaged["cat"] += r is not None and k.get("want_stats", False)
        return r

    def spy_v(*a, **k):
        r = orig[1](*a, **k)
        engaged["valid"] += r is not None and k.get("pre") is not None
        return r

    def spy_v3(*a, **k):
        r = orig[2](*a, **k)
        engaged["valid3"] += r is not None and k.get("pre") is not None
        return r

    pp.pconv_pad11_cat, pp.pconv_valid, pp.pconv3_valid = \
        spy_cat, spy_v, spy_v3
    return orig


def test_packed_pallas_fused_matches_reference(rng):
    """pallas_conv="fused" — deferred instance norm riding the Pallas
    conv chain (producers emit moment stats + in-kernel rim mask, the
    consuming VALID conv applies leaky(x*sa+ta)*mask on its VMEM slabs,
    aligned outputs finalize from kernel stats in one pass). Must equal
    SegModel.apply, with the cat producer AND fused valid consumers
    actually engaging (spied — a silent fallback cannot fake a pass)."""
    import rehrseg_tpu.ops.pallas_pconv as pp

    arch = dict(ARCH_SMALL, features_per_stage=(32, 32, 32, 32))
    model, params, x = _setup(arch, rng)
    ref_lr, ref_hr = model.apply(params, x)

    engaged = {"cat": 0, "valid": 0, "valid3": 0}
    orig = _fused_spies(pp, engaged)
    try:
        got_lr, got_hr = segmodel_apply_packed(
            arch, params, x, pack_max_channels=64, dual=True, upscale=4,
            pallas_conv="fused")
    finally:
        pp.pconv_pad11_cat, pp.pconv_valid, pp.pconv3_valid = orig
    assert engaged["cat"] >= 1, engaged
    assert engaged["valid"] >= 2, engaged   # enc s0 conv_1 + dec conv_1
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=2e-4, atol=2e-4)


def test_packed_pallas_fused_kd3_matches_reference(rng):
    """Fused mode through the kd=3 class (pconv3_valid with deferred
    norm): 64-feature stages at an 8-aligned half-res width."""
    import rehrseg_tpu.ops.pallas_pconv as pp

    arch = dict(ARCH_SMALL, features_per_stage=(32, 64, 64, 64))
    model, params, x = _setup(arch, rng, shape=(2, 8, 32, 64, 1))
    ref_lr, ref_hr = model.apply(params, x)

    engaged = {"cat": 0, "valid": 0, "valid3": 0}
    orig = _fused_spies(pp, engaged)
    try:
        got_lr, got_hr = segmodel_apply_packed(
            arch, params, x, pack_max_channels=64, dual=True, upscale=4,
            pallas_conv="fused")
    finally:
        pp.pconv_pad11_cat, pp.pconv_valid, pp.pconv3_valid = orig
    assert engaged["valid3"] >= 1, engaged
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=5e-4, atol=5e-4)


def test_packed_pallas_fused_uncovered_arch_falls_back(rng):
    """At channel counts no kernel covers (8/16 features), "fused" must
    agree with the plain packed path (deferral materializes via the same
    instance-norm math — tolerance only for fp reassociation)."""
    model, params, x = _setup(ARCH_SMALL, rng)
    base = segmodel_apply_packed(ARCH_SMALL, params, x,
                                 pack_max_channels=64)
    fused = segmodel_apply_packed(ARCH_SMALL, params, x,
                                  pack_max_channels=64,
                                  pallas_conv="fused")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_packed_pallas_fused_plane_out(rng):
    """fused mode + plane_out (the aligned-engine emission)."""
    arch = dict(ARCH_SMALL, features_per_stage=(32, 32, 32, 32))
    model, params, x = _setup(arch, rng)
    base = segmodel_apply_packed(arch, params, x, pack_max_channels=64)
    planes = segmodel_apply_packed(arch, params, x, pack_max_channels=64,
                                   plane_out=True, pallas_conv="fused")
    np.testing.assert_allclose(
        np.asarray(planes), np.asarray(jnp.moveaxis(base, -1, 1)),
        rtol=2e-4, atol=2e-4)


def test_packed_pallas_conv_plane_out(rng):
    """pallas_conv + plane_out (the aligned-engine emission): per-class
    planes equal the channel-last logits."""
    model, params, x = _setup(ARCH_SMALL, rng)
    base = segmodel_apply_packed(ARCH_SMALL, params, x,
                                 pack_max_channels=64)
    planes = segmodel_apply_packed(ARCH_SMALL, params, x,
                                   pack_max_channels=64, plane_out=True,
                                   pallas_conv=True)
    np.testing.assert_allclose(
        np.asarray(planes), np.asarray(jnp.moveaxis(base, -1, 1)),
        rtol=2e-4, atol=2e-4)
