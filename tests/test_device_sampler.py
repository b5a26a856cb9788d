"""DeviceSRPatchSampler parity: the HBM-resident stage-1 sampler must be
bit-identical to the host SRPatchDataset/BatchLoader path at fixed seeds
(same RNG stream, same decision order; crop/transpose/pad/flip execute on
device instead of host numpy)."""

import numpy as np
import pytest

from rehrseg_tpu.data import SRPatchDataset, BatchLoader
from rehrseg_tpu.data.device_sampler import DeviceSRPatchSampler
from tests.test_data import _make_subject_nifti


def _make_ds(tmp_path, rng, **kw):
    return SRPatchDataset(str(tmp_path), ["sub1", "sub2"], 4.0, 1.0, None,
                          "rf-pulse-slr", (9, 12, 12), random_flip=True,
                          blur=True, nnunet_transform=False,
                          device_lr_sim=True, **kw)


@pytest.fixture
def two_subjects(tmp_path, rng):
    _make_subject_nifti(str(tmp_path / "sub1_0000.nii.gz"), rng)
    # sub2 is smaller than the patch along z AND x: exercises the
    # symmetric target_pad fold in the crop origin
    _make_subject_nifti(str(tmp_path / "sub2_0000.nii.gz"), rng,
                        shape=(7, 32, 8))
    return tmp_path


def test_device_sampler_bit_identical_to_host(two_subjects, rng):
    host = BatchLoader(_make_ds(two_subjects, rng), batch_size=4, seed=11)
    dev = DeviceSRPatchSampler(_make_ds(two_subjects, rng), batch_size=4,
                               seed=11)
    for _ in range(3):
        lr_h, hr_h = host.next()
        lr_d, hr_d = dev.next()
        assert lr_d.shape == lr_h.shape and hr_d.shape == hr_h.shape
        np.testing.assert_array_equal(np.asarray(lr_d), lr_h)
        np.testing.assert_array_equal(np.asarray(hr_d), hr_h)


def test_device_sampler_shard_partitions_global(two_subjects, rng):
    full = BatchLoader(_make_ds(two_subjects, rng), batch_size=4, seed=3,
                       shard=(0, 1))
    parts = [DeviceSRPatchSampler(_make_ds(two_subjects, rng), batch_size=4,
                                  seed=3, shard=(i, 2)) for i in (0, 1)]
    for _ in range(2):
        lr_f, hr_f = full.next()
        got = [p.next() for p in parts]
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(g[0]) for g in got]), lr_f)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(g[1]) for g in got]), hr_f)


def test_device_sampler_rejects_uncovered_modes(two_subjects, rng):
    ds = SRPatchDataset(str(two_subjects), ["sub1"], 4.0, 1.0, None,
                        "rf-pulse-slr", (16, 16), random_flip=True,
                        blur=True, nnunet_transform=False)  # thin-z WDSR
    with pytest.raises(ValueError, match="hot path"):
        DeviceSRPatchSampler(ds, batch_size=2)
