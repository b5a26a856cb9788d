"""Training step tests: SR and seg stages, loss decrease, DP sharding over
the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from rehrseg_tpu.models import WDSR, UNet3D, SegModel, Distiller
from rehrseg_tpu.train import (
    TrainState, onecycle_adam, nesterov_sgd, poly_epoch_schedule,
    make_sr_train_step, crop_hr_target, make_seg_train_step,
    flavr_teacher_features, flavr_window_indices, SegBatch,
)
from rehrseg_tpu.parallel import make_mesh, shard_batch, replicate
from tests.test_models import SMALL_ARCH


def test_crop_hr_target():
    x = jnp.arange(2 * 16 * 4 * 4 * 2, dtype=jnp.float32).reshape(2, 16, 4, 4, 2)
    out = crop_hr_target(x, 4, 4)
    assert out.shape == (2, 4, 4, 4, 2)
    assert np.allclose(np.asarray(out), np.asarray(x[:, 4:8]))
    # num_slices=1 (WDSR): unchanged
    assert crop_hr_target(x, 4, 1).shape == x.shape


def test_onecycle_schedule_shape():
    _, sched = onecycle_adam(5e-4, 1000)
    lrs = [float(sched(i)) for i in [0, 300, 999]]
    assert lrs[0] == pytest.approx(5e-4 / 25, rel=1e-3)
    assert lrs[1] == pytest.approx(5e-4, rel=1e-3)
    assert lrs[2] < 1e-6


def test_onecycle_schedule_tiny_steps_finite():
    # regression: optax.cosine_onecycle_schedule yields NaN for ALL steps
    # when transition_steps is tiny — smoke-test runs then silently train
    # with a NaN learning rate
    for total in (1, 2, 3, 5):
        _, sched = onecycle_adam(1e-3, total)
        lrs = np.asarray([float(sched(i)) for i in range(total + 2)])
        assert np.all(np.isfinite(lrs)), (total, lrs)
        assert np.all(lrs > 0) and np.all(lrs <= 1e-3 * 1.0001)


def test_poly_epoch_schedule():
    sched = poly_epoch_schedule(1e-3, 10, iters_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(5)) == pytest.approx(1e-3 * 0.9)
    assert float(sched(49)) == pytest.approx(1e-3 * 0.1)


def test_wdsr_sr_step_decreases_loss(rng):
    model = WDSR(out_channel=2, n_resblocks=2, num_channels=8, scale=4.0)
    x = jnp.asarray(rng.normal(size=(4, 8, 16, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4, 32, 16, 2)).astype(np.float32))
    y = y.at[..., 1].set((y[..., 1] > 0).astype(jnp.float32))
    params = model.init(jax.random.key(0), x)
    tx, _ = onecycle_adam(1e-3, 50)
    state = TrainState.create(params, tx)
    step = make_sr_train_step(model, tx, enable_uncertainty=False,
                              slice_separation=4, num_slices=1, donate=False)
    state, m0 = step(state, x, y)
    for _ in range(10):
        state, m = step(state, x, y)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11


def test_flavr_uncertainty_sr_step(rng):
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 2)).astype(np.float32))
    y = y.at[..., 1].set((y[..., 1] > 0).astype(jnp.float32))
    params = model.init(jax.random.key(0), x)
    tx, _ = onecycle_adam(5e-4, 20)
    state = TrainState.create(params, tx)
    step = make_sr_train_step(model, tx, enable_uncertainty=True,
                              slice_separation=4, num_slices=4, donate=False)
    state, m = step(state, x, y)
    assert np.isfinite(float(m["loss"]))


def test_flavr_window_indices():
    idx = flavr_window_indices(6)
    assert idx.shape == (5, 4)
    # padded coords: window 0 = [0,1,2,3] = [pad, x0, x1, x2]
    assert list(idx[0]) == [0, 1, 2, 3]
    assert list(idx[-1]) == [4, 5, 6, 7]


def test_flavr_teacher_features_shape(rng):
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    dummy = jnp.zeros((1, 4, 16, 16, 2))
    fparams = flavr.init(jax.random.key(0), dummy)
    img = jnp.asarray(rng.normal(size=(2, 6, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray((rng.normal(size=(2, 6, 16, 16, 1)) > 0).astype(np.float32))
    feats = flavr_teacher_features(flavr, fparams, img, lab)
    assert feats.shape == (2, 6, 8, 8, 64)


def test_seg_train_step_with_distillation(rng):
    seg = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    # SMALL_ARCH skips[1] has 16 ch at (D, H/2, W/2); teacher layer1 is 64ch
    dist = Distiller(student_dim=16, teacher_dim=64, lambda_l1=0.0,
                     lambda_cosine=1.0, lambda_structure=1.0)

    img = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)).astype(np.float32))
    lab_lr = jnp.asarray((rng.normal(size=(2, 4, 16, 16, 1)) > 0).astype(np.float32))
    lab_hr = jnp.asarray((rng.normal(size=(2, 16, 16, 16, 1)) > 0).astype(np.float32))
    unc = jnp.asarray(rng.uniform(0.5, 1.0, size=(2, 4, 16, 16, 1)).astype(np.float32))

    seg_params = seg.init(jax.random.key(0), img)
    fparams = flavr.init(jax.random.key(1), jnp.zeros((1, 4, 16, 16, 2)))
    s_feat = jnp.zeros((1, 4, 8, 8, 16))
    t_feat = jnp.zeros((1, 4, 8, 8, 64))
    dparams = dist.init(jax.random.key(2), s_feat, t_feat)

    sched = poly_epoch_schedule(1e-3, 10, 5)
    tx = nesterov_sgd(sched)
    params = {"seg": seg_params, "distiller": dparams}
    state = TrainState.create(params, tx)
    step = make_seg_train_step(seg, tx, enable_uncertainty=True,
                               enable_distillation=True, flavr_model=flavr,
                               distiller=dist, donate=False)
    batch = SegBatch(img, lab_lr, lab_hr, unc)
    state, m = step(state, fparams, batch)
    for k in ("loss", "loss_lr", "loss_hr", "loss_kd"):
        assert np.isfinite(float(m[k])), k
    state2, m2 = step(state, fparams, batch)
    assert int(state2.step) == 2


def test_seg_train_step_plain(rng):
    seg = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    img = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)).astype(np.float32))
    lab_lr = jnp.asarray((rng.normal(size=(2, 4, 16, 16, 1)) > 0).astype(np.float32))
    lab_hr = jnp.asarray((rng.normal(size=(2, 16, 16, 16, 1)) > 0).astype(np.float32))
    params = seg.init(jax.random.key(0), img)
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 10, 5))
    state = TrainState.create(params, tx)
    step = make_seg_train_step(seg, tx, enable_uncertainty=False,
                               enable_distillation=False, donate=False)
    batch = SegBatch(img, lab_lr, lab_hr, jnp.zeros_like(lab_lr))
    state, m = step(state, None, batch)
    assert np.isfinite(float(m["loss"]))


def test_dp_sharded_sr_step(rng):
    """Data-parallel WDSR step over the 8-device virtual mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    model = WDSR(out_channel=2, n_resblocks=1, num_channels=8, scale=4.0)
    x = rng.normal(size=(8, 8, 16, 2)).astype(np.float32)
    y = rng.normal(size=(8, 32, 16, 2)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x[:1]))
    tx, _ = onecycle_adam(1e-3, 10)

    params = replicate(params, mesh)
    state = TrainState.create(params, tx)
    xb, yb = shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
    step = make_sr_train_step(model, tx, enable_uncertainty=False,
                              slice_separation=4, num_slices=1, donate=False)
    state, m = step(state, xb, yb)
    assert np.isfinite(float(m["loss"]))
    # params stay replicated: every device holds the full tree
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_teacher_window_chunking_matches_full(rng):
    """Chunked teacher encoding equals the single-batch path."""
    from rehrseg_tpu.models import UNet3D
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    fparams = flavr.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 2)))
    img = jnp.asarray(rng.normal(size=(2, 6, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray((rng.normal(size=(2, 6, 16, 16, 1)) > 0).astype(np.float32))
    full = flavr_teacher_features(flavr, fparams, img, lab)
    chunked = flavr_teacher_features(flavr, fparams, img, lab, window_chunk=4)
    assert np.allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)


def test_spatial_sharded_seg_step(rng):
    """Stage-2 training over a (data=4, spatial=2) mesh — the pipeline's
    extra.mesh_spatial path (parallel.multihost.place_global /
    replicate_any): batch shards over 'data', the patch H dim over
    'spatial' (XLA inserts conv halo exchanges), and the step matches the
    unsharded step to float tolerance. This is the TPU answer to patches
    whose activations exceed one chip's HBM (SURVEY §5)."""
    from jax.sharding import PartitionSpec as P
    from rehrseg_tpu.parallel import multihost as mh

    assert len(jax.devices()) == 8
    mesh = make_mesh(spatial=2)
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}

    seg = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    dist = Distiller(student_dim=16, teacher_dim=64, lambda_l1=0.0,
                     lambda_cosine=1.0, lambda_structure=1.0)

    b, d, h, w = 4, 4, 32, 32
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * 4, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)

    seg_params = seg.init(jax.random.key(0), jnp.asarray(img[:1]))
    fparams = flavr.init(jax.random.key(1), jnp.zeros((1, 4, h, w, 2)))
    dparams = dist.init(jax.random.key(2),
                        jnp.zeros((1, d, h // 2, w // 2, 16)),
                        jnp.zeros((1, d, h // 2, w // 2, 64)))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 10, 5))
    params = {"seg": seg_params, "distiller": dparams}

    step = make_seg_train_step(seg, tx, enable_uncertainty=True,
                               enable_distillation=True, flavr_model=flavr,
                               distiller=dist, donate=False)

    # unsharded baseline
    state0 = TrainState.create(params, tx)
    batch0 = SegBatch(*(jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)))
    ref_state, ref_m = step(state0, fparams, batch0)

    # sharded: exactly the pipeline's placement calls
    spec = P("data", None, "spatial")
    state1 = mh.replicate_any(TrainState.create(params, tx), mesh)
    fparams_r = mh.replicate_any(fparams, mesh)
    batch1 = SegBatch(**mh.place_global(
        {"img": img, "label_lr": lab_lr, "label_hr": lab_hr,
         "uncertainty_lr": unc}, mesh, spec))
    sh_state, sh_m = step(state1, fparams_r, batch1)

    assert np.allclose(float(ref_m["loss"]), float(sh_m["loss"]),
                       rtol=1e-6, atol=1e-6)
    # SPMD reassociates reductions (psum of partial sums, halo-exchange
    # conv order), so updated params agree to float tolerance, not bitwise
    for pr, ps in zip(jax.tree.leaves(ref_state.params),
                      jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(ps),
                                   rtol=5e-4, atol=1e-5)
    # every device holds the full (replicated) params
    leaf = jax.tree.leaves(sh_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_select_remat_mode(rng):
    """The auto remat probe picks the fastest mode that fits the budget
    (AOT memory analysis), falls back to remat=True when nothing fits or
    when the device reports no budget (pipeline extra: {remat: auto})."""
    from rehrseg_tpu.train.seg_trainer import select_remat_mode

    seg = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    img = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)).astype(np.float32))
    lab_lr = jnp.asarray((rng.normal(size=(2, 4, 16, 16, 1)) > 0)
                         .astype(np.float32))
    lab_hr = jnp.asarray((rng.normal(size=(2, 16, 16, 16, 1)) > 0)
                         .astype(np.float32))
    params = seg.init(jax.random.key(0), img)
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 10, 5))
    state = TrainState.create(params, tx)
    batch = SegBatch(img, lab_lr, lab_hr, jnp.zeros_like(lab_lr))

    def build(mode):
        return make_seg_train_step(seg, tx, enable_uncertainty=False,
                                   enable_distillation=False, donate=False,
                                   remat=mode)

    # generous budget: the fastest candidate (no-remat) fits
    mode, why = select_remat_mode(build, state, None, batch,
                                  bytes_limit=1 << 40, margin_bytes=1 << 20)
    assert mode is False, why
    assert "fits" in why

    # impossible budget: terminal fallback is the guaranteed-fit mode
    mode, why = select_remat_mode(build, state, None, batch,
                                  bytes_limit=2, margin_bytes=1)
    assert mode is True
    assert "exceeded" in why

    # no budget reported (CPU memory_stats is None): safe default, no
    # probe compiles
    mode, why = select_remat_mode(build, state, None, batch)
    assert mode is True
    assert "bytes_limit" in why
