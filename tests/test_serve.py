"""Serving API: NIfTI in -> segmentation NIfTI out."""

import numpy as np

import jax
import jax.numpy as jnp

from rehrseg_tpu.io import nifti
from rehrseg_tpu.models import SegModel
from rehrseg_tpu.serve import Segmenter
from tests.test_models import SMALL_ARCH


def _make_segmenter():
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    return Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                     slice_separation=4, mirror=False)


def test_segment_array(rng):
    seg = _make_segmenter()
    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)
    pred = seg.segment(vol)
    assert pred.shape == (6, 24, 24)
    assert pred.dtype == np.uint8
    assert set(np.unique(pred)).issubset({0, 1})


def test_segment_hr(rng):
    seg = _make_segmenter()
    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)
    lr, hr = seg.segment(vol, hr=True)
    assert lr.shape == (6, 24, 24)
    assert hr.shape == (24, 24, 24)


def test_segment_many_matches_single(rng):
    seg = _make_segmenter()
    vols = [rng.normal(size=(6, 24, 24)).astype(np.float32) for _ in range(3)]
    many = seg.segment_many(vols)
    for v, m in zip(vols, many):
        assert np.array_equal(m, seg.segment(v))


def test_segment_file_roundtrip(tmp_path, rng):
    seg = _make_segmenter()
    vol = rng.normal(size=(24, 24, 6)).astype(np.float32)  # (x, y, z)
    aff = np.diag([1.0, 1.0, 4.0, 1.0])
    in_path = str(tmp_path / "in.nii.gz")
    nifti.save(nifti.NiftiImage(data=vol, affine=aff), in_path)
    out_path = str(tmp_path / "seg.nii.gz")
    hr_path = str(tmp_path / "seg_hr.nii.gz")
    seg.segment_file(in_path, out_path, hr_out_path=hr_path)

    out = nifti.read_image_itk(out_path)
    assert out.array.shape == (6, 24, 24)
    assert out.GetSpacing() == (1.0, 1.0, 4.0)
    hr = nifti.read_image_itk(hr_path)
    assert hr.array.shape == (24, 24, 24)
    assert abs(hr.GetSpacing()[2] - 1.0) < 1e-6
