"""Raw-mode SegSRDataset + device augmentation integration."""

import numpy as np

import jax
import jax.numpy as jnp

from rehrseg_tpu.data import SegSRDataset, BatchLoader
from rehrseg_tpu.data.device_aug import augment_seg_batch
from rehrseg_tpu.io import write_h5


def test_raw_mode_plus_device_aug(tmp_path, rng):
    shape = (48, 48, 32)
    write_h5(str(tmp_path / "sub1_0000.h5"),
             img=rng.normal(size=shape).astype(np.float32),
             seg=(rng.normal(size=shape) > 1).astype(np.float32),
             uncertainty=(rng.uniform(size=shape) * 255).astype(np.float32))
    ds = SegSRDataset(str(tmp_path), ["sub1"], 4.0, 1.0,
                      patch_size_ori=(40, 40, 6), target_patch_size=(24, 24, 6),
                      random_flip=True, uncertainty=True, device_augment=True)
    loader = BatchLoader(ds, batch_size=2)
    b = loader.next()
    # raw crops: full ps_ori in-plane extent, no host augmentation
    assert b["img"].shape == (2, 6, 40, 40, 1)
    assert b["label_hr"].shape == (2, 24, 40, 40, 1)

    img, llr, lhr, unc = augment_seg_batch(
        jax.random.key(0), jnp.asarray(b["img"]), jnp.asarray(b["label_lr"]),
        jnp.asarray(b["label_hr"]), jnp.asarray(b["uncertainty_lr"]),
        patch_hw=(24, 24))
    assert img.shape == (2, 6, 24, 24, 1)
    assert lhr.shape == (2, 24, 24, 24, 1)
    assert set(np.unique(np.asarray(llr))).issubset({0.0, 1.0})
