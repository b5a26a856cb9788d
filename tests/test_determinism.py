"""Golden determinism: fixed seeds produce identical values run-to-run
(SURVEY.md §4: golden-value tests for model forwards at fixed seeds)."""

import numpy as np

import jax
import jax.numpy as jnp

from rehrseg_tpu.models import WDSR, UNet3D, SegModel
from tests.test_models import SMALL_ARCH


def _forward_twice(model, x):
    p1 = model.init(jax.random.key(42), x)
    p2 = model.init(jax.random.key(42), x)
    o1 = model.apply(p1, x)
    o2 = model.apply(p2, x)
    return o1, o2


def test_wdsr_deterministic(rng):
    model = WDSR(out_channel=2, n_resblocks=2, num_channels=8, scale=4.0)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 2)).astype(np.float32))
    o1, o2 = _forward_twice(model, x)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_flavr_deterministic(rng):
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 2)).astype(np.float32))
    o1, o2 = _forward_twice(model, x)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_segmodel_deterministic(rng):
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32))
    (a1, b1), (a2, b2) = _forward_twice(model, x)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))


def test_dataset_sampling_deterministic(tmp_path, rng):
    from rehrseg_tpu.data import SRPatchDataset
    from rehrseg_tpu.io.nifti import NiftiImage, save
    img = rng.normal(size=(32, 32, 12)).astype(np.float32)
    lab = (rng.normal(size=(32, 32, 12)) > 1).astype(np.float32)
    save(NiftiImage(data=np.stack([img, lab], -1),
                    affine=np.diag([1.0, 1.0, 4.0, 1.0])),
         str(tmp_path / "s_0000.nii.gz"))

    def draw(seed):
        ds = SRPatchDataset(str(tmp_path), ["s"], 4.0, 1.0, None,
                            "rf-pulse-slr", (16, 16), random_flip=True,
                            blur=True, nnunet_transform=False, seed=seed)
        return ds.sample(0)

    lr1, hr1 = draw(7)
    lr2, hr2 = draw(7)
    assert np.array_equal(lr1, lr2)
    assert np.array_equal(hr1, hr2)
