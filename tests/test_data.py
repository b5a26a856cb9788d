"""Tests for normalization, augmentation transforms, and datasets."""

import numpy as np
import pytest

from rehrseg_tpu.data import (
    zscore_normalization, zeroone_normalization, percentile_normalization,
    TrainingTransforms, SRPatchDataset, SegSRDataset, BatchLoader,
)
from rehrseg_tpu.io import write_h5
from rehrseg_tpu.io.nifti import NiftiImage, save as nifti_save


def test_zscore(rng):
    x = rng.normal(3.0, 2.0, size=(16, 16, 8)).astype(np.float32)
    z = zscore_normalization(x)
    assert abs(z.mean()) < 1e-5
    assert abs(z.std() - 1) < 1e-4


def test_zeroone(rng):
    x = rng.normal(size=(8, 8)).astype(np.float32)
    z = zeroone_normalization(x)
    assert z.min() == 0 and z.max() == pytest.approx(1.0)


def test_percentile_norm(rng):
    x = rng.normal(10, 5, size=(32, 32)).astype(np.float32)
    z = percentile_normalization(x)
    assert 0 <= z.min() and z.max() <= 1.0


# ------------------------------------------------------------- transforms

def test_spatial_identity_when_no_aug(rng):
    """With p=0 rotations/scales the transform is a center crop / identity."""
    from rehrseg_tpu.data.transforms import augment_spatial_2d
    data = rng.normal(size=(2, 16, 16)).astype(np.float32)
    seg = (rng.normal(size=(1, 16, 16)) > 0).astype(np.float32)
    out_d, out_s = augment_spatial_2d(data, [seg], (16, 16), rng,
                                      p_rot_per_sample=0.0,
                                      p_scale_per_sample=0.0)
    assert np.allclose(out_d, data)
    assert np.allclose(out_s[0], seg)


def test_spatial_center_crop(rng):
    from rehrseg_tpu.data.transforms import augment_spatial_2d
    data = rng.normal(size=(1, 20, 20)).astype(np.float32)
    out_d, _ = augment_spatial_2d(data, [], (12, 12), rng,
                                  p_rot_per_sample=0.0, p_scale_per_sample=0.0)
    assert out_d.shape == (1, 12, 12)
    assert np.allclose(out_d[0], data[0, 4:16, 4:16], atol=1e-6)


def test_spatial_rotation_preserves_labels_binary(rng):
    from rehrseg_tpu.data.transforms import augment_spatial_2d
    data = rng.normal(size=(1, 24, 24)).astype(np.float32)
    seg = np.zeros((1, 24, 24), dtype=np.float32)
    seg[0, 8:16, 8:16] = 1.0
    out_d, out_s = augment_spatial_2d(data, [seg], (24, 24), rng,
                                      p_rot_per_sample=1.0,
                                      p_scale_per_sample=1.0)
    assert set(np.unique(out_s[0])).issubset({0.0, 1.0})


def test_training_transforms_pipeline(rng):
    tfm = TrainingTransforms((4, 24, 24), enable_spatial=True,
                             enable_uncertainty=True,
                             extra_keys=["seg", "seg_sr", "uncertainty"])
    d = {
        "data": rng.normal(size=(1, 4, 32, 32)).astype(np.float32),
        "seg": (rng.normal(size=(1, 4, 32, 32)) > 0).astype(np.float32),
        "seg_sr": (rng.normal(size=(1, 16, 32, 32)) > 0).astype(np.float32),
        "uncertainty": rng.uniform(size=(1, 4, 32, 32)).astype(np.float32),
    }
    out = tfm(rng, **d)
    assert out["data"].shape == (1, 4, 24, 24)
    assert out["seg"].shape == (1, 4, 24, 24)
    assert out["seg_sr"].shape == (1, 16, 24, 24)
    assert out["uncertainty"].shape == (1, 4, 24, 24)
    assert set(np.unique(out["seg"])).issubset({0.0, 1.0})
    # uncertainty stays continuous (cubic interp may over/undershoot a bit)
    assert len(np.unique(out["uncertainty"])) > 2
    assert np.isfinite(out["uncertainty"]).all()


def test_intensity_transforms_shapes(rng):
    from rehrseg_tpu.data import transforms as T
    x = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    for fn in (T.augment_gaussian_noise, T.augment_gaussian_blur,
               T.augment_brightness_multiplicative, T.augment_contrast,
               T.augment_linear_downsampling, T.augment_gamma):
        out = fn(x, rng)
        assert out.shape == x.shape
        assert np.isfinite(out).all()


def test_gamma_retain_stats(rng):
    from rehrseg_tpu.data.transforms import augment_gamma
    x = rng.normal(2.0, 3.0, size=(1, 32, 32)).astype(np.float64)
    out = augment_gamma(x, rng, retain_stats=True)
    assert out[0].mean() == pytest.approx(x[0].mean(), abs=1e-6)
    assert out[0].std() == pytest.approx(x[0].std(), rel=1e-5)


# --------------------------------------------------------------- datasets

def _make_subject_nifti(path, rng, shape=(32, 32, 12)):
    img = rng.normal(size=shape).astype(np.float32)
    lab = (rng.normal(size=shape) > 1).astype(np.float32)
    merged = np.stack([img, lab], axis=-1)
    nifti_save(NiftiImage(data=merged,
                          affine=np.diag([1.0, 1.0, 4.0, 1.0])), path)


def test_sr_dataset_wdsr_mode(tmp_path, rng):
    """2D (thin z) patches: WDSR geometry — HR x extent = 4x LR."""
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng)
    ds = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                        "rf-pulse-slr", (16, 16), random_flip=True,
                        blur=True, nnunet_transform=False)
    lr, hr = ds.sample(0)
    assert hr.shape == (16, 16, 2)
    assert lr.shape == (4, 16, 2)
    assert set(np.unique(hr[..., 1])).issubset({0.0, 1.0})


def test_sr_dataset_single_channel_mode(tmp_path, rng):
    """channels=1 (sr_mode='img', sr_utils.py:42-43): image-only pairs with
    the SAME content as channel 0 of the 2-channel stream (shared RNG)."""
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng)
    kw = dict(random_flip=True, blur=True, nnunet_transform=False)
    ds1 = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                         "rf-pulse-slr", (16, 16), channels=1, **kw)
    ds2 = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                         "rf-pulse-slr", (16, 16), channels=2, **kw)
    r1 = np.random.default_rng(5)
    r2 = np.random.default_rng(5)
    lr1, hr1 = ds1.sample(0, rng=r1)
    lr2, hr2 = ds2.sample(0, rng=r2)
    assert hr1.shape == (16, 16, 1) and lr1.shape == (4, 16, 1)
    np.testing.assert_array_equal(hr1, hr2[..., :1])
    np.testing.assert_array_equal(lr1, lr2[..., :1])


def test_sr_loss_single_channel():
    """sr_mode='img' training: L1 only, finite (no empty-channel BCEDice)."""
    import jax.numpy as jnp
    from rehrseg_tpu.losses import sr_loss
    pred = jnp.ones((2, 8, 8, 1)) * 0.5
    target = jnp.zeros((2, 8, 8, 1))
    loss = float(sr_loss(pred, target))
    assert np.isfinite(loss) and loss == pytest.approx(0.5)


def test_sr_dataset_flavr_mode(tmp_path, rng):
    """3D patches: (D, H, W, C) with D_hr = 16, D_lr = 4."""
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng,
                        shape=(32, 32, 16))
    # in-plane dims must be square: the reference's pad target for y is
    # patch_size[0] (train_set.py:361) and the final transpose coin flip
    # swaps the in-plane axes (train_set.py:424-431) — both are only
    # shape-stable for y == z patches, which all shipped configs use.
    ds = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                        "rf-pulse-slr", (16, 16, 16), random_flip=True,
                        blur=True, nnunet_transform=True)
    lr, hr = ds.sample(0)
    assert hr.shape == (16, 16, 16, 2)
    assert lr.shape == (4, 16, 16, 2)


def test_sr_dataset_from_h5(tmp_path, rng):
    img = rng.normal(size=(24, 24, 8, 1)).astype(np.float32)
    lab = (rng.normal(size=(24, 24, 8, 1)) > 1).astype(np.uint8)
    fx = rng.normal(size=(8, 1, 24, 24)).astype(np.float32)
    fy = rng.normal(size=(8, 1, 24, 24)).astype(np.float32)
    write_h5(str(tmp_path / "sub1.h5"), img_hr=img, label_hr=lab,
             image_x_rgb=fx, image_y_rgb=fy)
    ds = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                        "rf-pulse-slr", (16, 16), random_flip=False,
                        blur=True, nnunet_transform=False)
    lr, hr = ds.sample(0)
    assert hr.shape == (16, 16, 2)
    assert lr.shape == (4, 16, 2)


def test_segsr_dataset(tmp_path, rng):
    shape = (48, 48, 32)  # pseudo-HR volume (x, y, z_hr)
    write_h5(str(tmp_path / "sub1_0000.h5"),
             img=rng.normal(size=shape).astype(np.float32),
             seg=(rng.normal(size=shape) > 1).astype(np.float32),
             uncertainty=(rng.uniform(size=shape) * 255).astype(np.float32))
    ds = SegSRDataset(str(tmp_path), ["sub1"], 4.0, 1.0,
                      patch_size_ori=(40, 40, 6), target_patch_size=(24, 24, 6),
                      random_flip=True, uncertainty=True)
    out = ds.sample(0)
    assert out["img"].shape == (6, 24, 24, 1)
    assert out["label_lr"].shape == (6, 24, 24, 1)
    assert out["label_hr"].shape == (24, 24, 24, 1)
    assert out["uncertainty_lr"].shape == (6, 24, 24, 1)
    # uncertainty weight transform: 1 - u/255*0.99 in (0.01, 1]
    u = out["uncertainty_lr"]
    assert u.min() >= -0.05 and u.max() <= 1.05


def test_batch_loader(tmp_path, rng):
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng)
    ds = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                        "rf-pulse-slr", (16, 16), random_flip=False,
                        blur=True, nnunet_transform=False)
    loader = BatchLoader(ds, batch_size=3)
    lr, hr = loader.next()
    assert lr.shape == (3, 4, 16, 2)
    assert hr.shape == (3, 16, 16, 2)


def test_prefetch_loader_matches_sync(tmp_path, rng):
    from rehrseg_tpu.data import PrefetchLoader
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng)

    def make_loader():
        ds = SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                            "rf-pulse-slr", (16, 16), random_flip=True,
                            blur=True, nnunet_transform=False)
        return BatchLoader(ds, batch_size=2, seed=5)

    sync = make_loader()
    ref_batches = [sync.next() for _ in range(3)]
    pre = PrefetchLoader(make_loader(), depth=2)
    for lr_ref, hr_ref in ref_batches:
        lr, hr = pre.next()
        assert np.array_equal(lr, lr_ref)
        assert np.array_equal(hr, hr_ref)
    pre.close()


def test_multiprocess_loader_matches_seeded_stream(tmp_path, rng):
    """MultiprocessBatchLoader batches are byte-identical to the seeded
    per-sample stream (BatchLoader shard=(0,1)) regardless of workers."""
    from rehrseg_tpu.data.datasets import MultiprocessBatchLoader
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng)

    def make_ds():
        return SRPatchDataset(str(tmp_path), ["sub1"], 4.0, 1.0, None,
                              "rf-pulse-slr", (16, 16), random_flip=True,
                              blur=True, nnunet_transform=False)

    ref = BatchLoader(make_ds(), batch_size=4, seed=5, shard=(0, 1))
    ref_batches = [ref.next() for _ in range(3)]
    mp = MultiprocessBatchLoader(make_ds(), batch_size=4, num_workers=2,
                                 seed=5)
    try:
        for lr_ref, hr_ref in ref_batches:
            lr, hr = mp.next()
            assert np.array_equal(lr, lr_ref)
            assert np.array_equal(hr, hr_ref)
    finally:
        mp.close()


def test_multiprocess_loader_error_and_close(tmp_path, rng):
    from rehrseg_tpu.data.datasets import MultiprocessBatchLoader
    import pytest

    class Bad:
        def sample(self, i=None, rng=None):
            raise ValueError("boom")

    mp = MultiprocessBatchLoader(Bad(), batch_size=2, num_workers=1)
    with pytest.raises(RuntimeError, match="boom"):
        mp.next()
    mp.close()
    with pytest.raises(RuntimeError, match="closed"):
        mp.next()


def test_multiprocess_loader_dead_worker_raises(tmp_path, rng):
    """A worker process that DIES (OOM-kill, segfault) can't report through
    the queue; the watchdog must turn the would-be-infinite next() wait
    into a loud error (round-4 review: a silent stall would deadlock every
    other pod host at the next collective)."""
    import os as _os
    import pytest
    from rehrseg_tpu.data.datasets import MultiprocessBatchLoader

    class Dies:
        def sample(self, i=None, rng=None):
            _os._exit(3)          # simulates a kill: no exception, no put

    mp = MultiprocessBatchLoader(Dies(), batch_size=2, num_workers=1)
    try:
        with pytest.raises(RuntimeError, match="worker process"):
            mp.next()
    finally:
        mp.close()


def test_sr_dataset_anchored_subject_matching(tmp_path, rng):
    """Subject 'case_1' must resolve to case_1_0000.nii.gz, never case_10
    (the reference constructs exact filenames, train_set.py:181; a bare
    substring match over unsorted listdir could leak the wrong subject)."""
    _make_subject_nifti(str(tmp_path / "case_10_0000.nii.gz"), rng)
    _make_subject_nifti(str(tmp_path / "case_1_0000.nii.gz"), rng)
    _make_subject_nifti(str(tmp_path / "case_11_0000.nii.gz"), rng)
    ds = SRPatchDataset(str(tmp_path), ["case_1"], 4.0, 1.0, None,
                        "rf-pulse-slr", (16, 16), random_flip=False,
                        blur=False, nnunet_transform=False, preload=False)
    assert ds.subjects == ["case_1_0000.nii.gz"]


def test_stage2_loader_workers_shard_device_aug_compose(tmp_path, rng):
    """VERDICT r4 #7 joint test: worker processes (extra.loader_workers),
    per-host sharding (shard=), and device augmentation landed in
    different rounds — pin that they compose through the REAL stage-2
    factory (Pipeline._make_loader). Each 2-shard multiprocess loader
    must be byte-identical to the single-thread BatchLoader under the
    same shard, the two shards must partition the global batch, and the
    jitted device augmenter must produce identical tensors on the
    identical batches."""
    import jax
    import jax.numpy as jnp

    from rehrseg_tpu.config import Config
    from rehrseg_tpu.pipeline import Pipeline
    from rehrseg_tpu.data.device_aug import augment_seg_batch

    for name in ("sub1", "sub2"):
        shape = (48, 48, 32)
        write_h5(str(tmp_path / f"{name}_0000.h5"),
                 img=rng.normal(size=shape).astype(np.float32),
                 seg=(rng.normal(size=shape) > 1).astype(np.float32),
                 uncertainty=(rng.uniform(size=shape) * 255
                              ).astype(np.float32))

    cfg = Config(data_path=str(tmp_path), tmp_path=str(tmp_path / "tmp"),
                 checkpoint_path=str(tmp_path / "ckpt"))
    cfg.extra = {"loader_workers": 2}
    pipe = Pipeline(cfg)
    assert pipe.data_shard is None      # single process; shards simulated

    def make_ds():
        return SegSRDataset(str(tmp_path), ["sub1", "sub2"], 4.0, 1.0,
                            patch_size_ori=(40, 40, 6),
                            target_patch_size=(24, 24, 6),
                            random_flip=True, uncertainty=True,
                            device_augment=True)

    n_batches, bsz = 3, 4
    global_ref = BatchLoader(make_ds(), batch_size=bsz, shard=(0, 1))
    global_batches = [global_ref.next() for _ in range(n_batches)]

    shard_batches = []
    for idx in (0, 1):
        pipe.data_shard = (idx, 2)      # what a 2-host pod would set
        mp = pipe._make_loader(make_ds(), bsz)
        assert type(mp).__name__ == "MultiprocessBatchLoader"
        try:
            got = [mp.next() for _ in range(n_batches)]
        finally:
            mp.close()
        ref = BatchLoader(make_ds(), batch_size=bsz, shard=(idx, 2))
        for g, w in zip(got, [ref.next() for _ in range(n_batches)]):
            assert set(g) == set(w)
            for k in w:
                assert np.array_equal(g[k], w[k]), k
        shard_batches.append(got)

    # the two host slices partition the global deterministic batch
    for g0, g1, full in zip(*shard_batches, global_batches):
        for k in full:
            assert np.array_equal(np.concatenate([g0[k], g1[k]]), full[k])

    # device aug on identical batches is identical (pure fn of batch+key)
    b = shard_batches[0][0]
    aug = jax.jit(lambda k, a, b_, c, d: augment_seg_batch(
        k, a, b_, c, d, patch_hw=(24, 24), enable_uncertainty=True))
    outs = [aug(jax.random.key(0), jnp.asarray(b["img"]),
                jnp.asarray(b["label_lr"]), jnp.asarray(b["label_hr"]),
                jnp.asarray(b["uncertainty_lr"])) for _ in range(2)]
    for a, c in zip(*outs):
        assert np.array_equal(np.asarray(a), np.asarray(c))
    assert outs[0][0].shape == (bsz // 2, 6, 24, 24, 1)
