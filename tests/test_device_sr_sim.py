"""Device LR simulation equals the host path (minus the dropout RNG)."""

import numpy as np

import jax
import jax.numpy as jnp

from rehrseg_tpu.data.device_sr_sim import simulate_lr_batch
from rehrseg_tpu.ops.bspline import resize_1d_np


def test_simulate_lr_matches_host(rng):
    b, x, z, y = 2, 16, 4, 8
    src = rng.normal(size=(b, x, z, y, 2)).astype(np.float32)
    src[..., 1] = (src[..., 1] > 0)
    out = np.asarray(simulate_lr_batch(jax.random.key(0), jnp.asarray(src),
                                       4.0, zero_dropout=False))
    assert out.shape == (b, 4, z, y, 2)
    ref_img = resize_1d_np(src[..., 0].astype(np.float64), 4.0, axis=1, order=3)
    ref_lab = resize_1d_np(src[..., 1].astype(np.float64), 4.0, axis=1, order=0)
    assert np.allclose(out[..., 0], ref_img, atol=1e-4)
    assert np.allclose(out[..., 1], ref_lab, atol=1e-4)


def test_zero_dropout_statistics(rng):
    b, x, z, y = 64, 8, 4, 4
    src = jnp.asarray(np.abs(rng.normal(size=(b, x, z, y, 2))).astype(np.float32) + 1)
    out = np.asarray(simulate_lr_batch(jax.random.key(1), src, 4.0,
                                       zero_dropout=True))
    first_zeroed = (out[:, 0] == 0).all(axis=(1, 2, 3))
    last_zeroed = (out[:, -1] == 0).all(axis=(1, 2, 3))
    # p=0.1 each: expect a few but not all
    assert 0 < first_zeroed.sum() < b
    assert 0 < last_zeroed.sum() < b


def test_dataset_device_lr_sim_mode(tmp_path, rng):
    from rehrseg_tpu.data import SRPatchDataset
    from rehrseg_tpu.io.nifti import NiftiImage, save
    img = rng.normal(size=(32, 32, 16)).astype(np.float32)
    lab = (rng.normal(size=(32, 32, 16)) > 1).astype(np.float32)
    save(NiftiImage(data=np.stack([img, lab], -1),
                    affine=np.diag([1.0, 1.0, 4.0, 1.0])),
         str(tmp_path / "s_0000.nii.gz"))
    ds = SRPatchDataset(str(tmp_path), ["s"], 4.0, 1.0, None, "rf-pulse-slr",
                        (16, 16, 16), random_flip=True, blur=True,
                        nnunet_transform=False, device_lr_sim=True)
    lr_pre, hr = ds.sample(0)
    assert lr_pre.shape == (16, 16, 16, 2)  # full X extent, pre-resize
    assert hr.shape == (16, 16, 16, 2)
    out = simulate_lr_batch(jax.random.key(0), jnp.asarray(lr_pre[None]), 4.0)
    assert out.shape == (1, 4, 16, 16, 2)
