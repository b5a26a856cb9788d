"""End-to-end integration test: the full 3-stage pipeline on a tiny synthetic
dataset (SURVEY.md §4's integration-test requirement)."""

import os

import numpy as np
import pytest

from rehrseg_tpu.config import Config
from rehrseg_tpu.io.nifti import NiftiImage, save as nifti_save
from rehrseg_tpu.pipeline import Pipeline, merge_images_and_labels


TINY_ARCH = dict(
    n_stages=3,
    features_per_stage=[4, 8, 8],
    kernel_sizes=[[1, 3, 3], [3, 3, 3], [3, 3, 3]],
    strides=[[1, 1, 1], [1, 2, 2], [2, 2, 2]],
    n_conv_per_stage=[1, 1, 1],
    n_conv_per_stage_decoder=[1, 1],
    conv_bias=True, norm_eps=1e-5, norm_affine=True, nonlin_slope=0.01,
)


@pytest.fixture
def synthetic_dataset(tmp_path):
    rng = np.random.default_rng(0)
    images = tmp_path / "imagesTr"
    labels = tmp_path / "labelsTr"
    images.mkdir()
    labels.mkdir()
    for name in ("sub1", "sub2"):
        shape = (24, 24, 8)
        img = rng.normal(size=shape).astype(np.float32)
        img[8:16, 8:16, 2:6] += 3.0  # a bright blob
        lab = np.zeros(shape, dtype=np.float32)
        lab[8:16, 8:16, 2:6] = 1.0
        aff = np.diag([1.0, 1.0, 4.0, 1.0])
        nifti_save(NiftiImage(data=img, affine=aff),
                   str(images / f"{name}_0000.nii.gz"))
        nifti_save(NiftiImage(data=lab, affine=aff),
                   str(labels / f"{name}.nii.gz"))
    return tmp_path


def _tiny_config(root) -> Config:
    cfg = Config(
        data_path=str(root / "imagesTr"),
        tmp_path=str(root / "tmp"),
        checkpoint_path=str(root / "ckpt"),
        seg_path="",
        smore_initialization=False,     # zoom fallback: fast path
        pretrain_path=None,
        batch_size_sr=2,
        lr_sr=1e-3,
        n_patches=4,                    # 2 steps
        save_iters_sr=100,
        num_slices=4,
        patch_size=16,
        slice_thickness=4.0,
        target_thickness=1.0,
        blur_kernel="rf-pulse-slr",
        random_flip=True,
        nnunet_transform=False,
        enable_uncertainty=True,
        batch_size_segsr=1,
        lr_segsr=1e-3,
        epochs=1,
        save_iters_segsr=1000,          # skip in-loop eval
        enable_distillation=True,
        lambda_l1=0.0,
        lambda_cosine=1.0,
        lambda_structure=1.0,
        fold=None,
        uncertainty_steps=1,
    )
    cfg.extra = {
        "wdsr_n_resblocks": 1,
        "wdsr_num_channels": 4,
        "arch_override": TINY_ARCH,
        "patch_size_zyx": [4, 16, 16],
        "eval_mirror": False,
    }
    return cfg


def test_merge_images_and_labels(synthetic_dataset):
    out = synthetic_dataset / "merged"
    merge_images_and_labels(str(synthetic_dataset / "imagesTr"), str(out))
    from rehrseg_tpu.io import nifti
    merged = nifti.load(str(out / "sub1_0000.nii.gz"))
    assert merged.shape == (24, 24, 8, 2)
    assert merged.header.get_zooms()[:3] == (1.0, 1.0, 4.0)
    assert set(np.unique(merged.data[..., 1])).issubset({0.0, 1.0})


@pytest.mark.slow
def test_stage1a_smore_path(synthetic_dataset):
    """WDSR-initialization branch: train tiny WDSR, run volume inference,
    produce the stage-1 h5 store (train_all.py:265-320)."""
    cfg = _tiny_config(synthetic_dataset)
    cfg.smore_initialization = True
    cfg.extra["device_lr_sim"] = True  # exercise the device LR-sim path
    pipe = Pipeline(cfg)
    pipe.preprocess()
    pipe.stage1a_smore()
    import h5py
    p = os.path.join(pipe.sr_h5_path, "sub1_0000.nii.gz.h5")
    assert os.path.exists(p)
    with h5py.File(p) as f:
        # WDSR upsamples z by 4
        assert f["img_hr"].shape[2] == 32
        assert f["label_hr"].shape[2] == 32
        assert set(np.unique(f["label_hr"][:])).issubset({0, 1})
        assert f["image_x_rgb"].shape[0] == 32  # (z, 1, x, y)
    # per-subject SMORE NIfTI artifacts (inference_smore surface,
    # sr_utils.py:77-101): _img fp32 + _seg uint8 at HR z-spacing
    from rehrseg_tpu.io import nifti
    smore_out = os.path.join(cfg.tmp_path, "smore_output")
    img = nifti.read_image_itk(
        os.path.join(smore_out, "sub1_0000_img.nii.gz"))
    seg = nifti.read_image_itk(
        os.path.join(smore_out, "sub1_0000_seg.nii.gz"))
    assert img.array.shape[0] == 32 and seg.array.shape[0] == 32
    assert img.spacing[2] == pytest.approx(4.0 / 4)
    assert set(np.unique(seg.array)).issubset({0, 1})


@pytest.mark.slow
def test_stage1a_smore_img_mode(synthetic_dataset):
    """sr_mode='img': single-channel WDSR (sr_utils.py:42-43); only the
    _img NIfTI is written and the h5 label falls back to nearest zoom."""
    cfg = _tiny_config(synthetic_dataset)
    cfg.smore_initialization = True
    cfg.extra["sr_mode"] = "img"
    pipe = Pipeline(cfg)
    pipe.preprocess()
    pipe.stage1a_smore()
    import h5py
    smore_out = os.path.join(cfg.tmp_path, "smore_output")
    assert os.path.exists(
        os.path.join(smore_out, "sub1_0000_img.nii.gz"))
    assert not os.path.exists(
        os.path.join(smore_out, "sub1_0000_seg.nii.gz"))
    with h5py.File(os.path.join(pipe.sr_h5_path,
                                "sub1_0000.nii.gz.h5")) as f:
        assert f["img_hr"].shape[2] == 32
        assert f["label_hr"].shape[2] == 32
        assert set(np.unique(f["label_hr"][:])).issubset({0, 1})


@pytest.mark.slow
def test_full_pipeline_e2e(synthetic_dataset):
    cfg = _tiny_config(synthetic_dataset)
    pipe = Pipeline(cfg)
    seg_model, state, _ = pipe.run()

    # stage-1 artifacts exist
    assert os.path.exists(os.path.join(pipe.sr_h5_path, "sub1_0000.nii.gz.h5"))
    flavr_img = os.path.join(pipe.flavr_output_path, "sub1_0000_img.nii.gz")
    assert os.path.exists(flavr_img)
    assert os.path.exists(os.path.join(pipe.flavr_output_path,
                                       "sub1_0000_uncertainty.nii.gz"))
    # SR volume has ~4x slices: 4*(z_pad-1)
    from rehrseg_tpu.io import nifti
    sr = nifti.load(flavr_img)
    assert sr.shape[2] == 4 * (8 - 1)
    # stage-2 h5 + checkpoint exist
    assert os.path.exists(os.path.join(pipe.segsr_h5_path, "sub1_0000.h5"))
    assert int(state.step) >= 1

    # resume: second run skips all stages via artifacts/checkpoints
    pipe2 = Pipeline(cfg)
    seg_model2, state2, _ = pipe2.run()
    assert int(state2.step) >= int(state.step)


def test_fold_splits_synthetic(synthetic_dataset):
    cfg = _tiny_config(synthetic_dataset)
    cfg.fold = "all"
    pipe = Pipeline(cfg)
    folds = pipe._fold_splits()
    assert len(folds) == 2
    for train, val in folds:
        assert train and val
        assert not (set(train) & set(val))
    # every subject is exactly one fold's val subject
    all_val = [s for _, val in folds for s in val]
    assert sorted(all_val) == ["sub1", "sub2"]


@pytest.mark.slow
def test_fold_parallel_stage2_e2e(synthetic_dataset):
    """VERDICT round-1 item 5: `--fold all` trains K folds simultaneously on
    the CPU mesh, with per-fold checkpoints + eval (BASELINE config #5)."""
    cfg = _tiny_config(synthetic_dataset)
    cfg.fold = "all"
    cfg.save_iters_segsr = 2   # trigger one eval + save inside the loop
    pipe = Pipeline(cfg)
    seg, states, best = pipe.run()

    assert len(states) == 2 and len(best) == 2
    from rehrseg_tpu.train import checkpoint as ckpt
    for k in range(2):
        assert ckpt.has_checkpoint(pipe.segsr_ckpt + f"_fold{k}")
    # folds trained on different subjects -> different params
    leaves0 = np.concatenate([np.ravel(x)[:8] for x in
                              np.asarray(states[0].params["seg"]["params"]
                                         ["encoder"]["stage_0"]["conv_0"]
                                         ["conv"]["kernel"])[None]])
    leaves1 = np.concatenate([np.ravel(x)[:8] for x in
                              np.asarray(states[1].params["seg"]["params"]
                                         ["encoder"]["stage_0"]["conv_0"]
                                         ["conv"]["kernel"])[None]])
    assert not np.allclose(leaves0, leaves1)
    assert os.path.exists(os.path.join(pipe.segsr_ckpt + "_folds",
                                       "metrics.jsonl"))


def test_sr_psnr_logged_with_hr_reference(synthetic_dataset, tmp_path):
    """VERDICT round-1 item 9: when an HR ground-truth volume exists
    (hr_reference_path), stage-1 inference logs its PSNR to metrics.jsonl."""
    import json
    from rehrseg_tpu.io import nifti as nif

    cfg = _tiny_config(synthetic_dataset)
    hr_dir = tmp_path / "hr_refs"
    hr_dir.mkdir()
    cfg.extra["hr_reference_path"] = str(hr_dir)
    pipe = Pipeline(cfg)

    # a fake SR output (z, y, x) and a matching HR reference on disk
    rng = np.random.default_rng(0)
    sr = rng.normal(size=(28, 24, 24)).astype(np.float32)
    hr = sr + 0.1 * rng.normal(size=sr.shape).astype(np.float32)
    nif.write_image_itk(
        nif.ItkLikeImage(hr, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
                         (1, 0, 0, 0, 1, 0, 0, 0, 1)),
        str(hr_dir / "sub1_0000.nii.gz"))

    pipe._log_sr_psnr("sub1_0000.nii.gz", sr)
    mpath = os.path.join(pipe.flavr_ckpt, "metrics.jsonl")
    assert os.path.exists(mpath)
    recs = [json.loads(l) for l in open(mpath)]
    assert any("psnr" in r and np.isfinite(r["psnr"]) for r in recs)

    # silently skips when no reference exists
    pipe._log_sr_psnr("sub_missing.nii.gz", sr)


@pytest.mark.slow
def test_stage1a_smore_nifti_backfill(synthetic_dataset):
    """A run interrupted between the h5 write and the NIfTI write (or
    upgraded from a pre-NIfTI version) must backfill the SMORE artifacts
    from the h5 on resume instead of skipping them forever."""
    import shutil
    cfg = _tiny_config(synthetic_dataset)
    cfg.smore_initialization = True
    pipe = Pipeline(cfg)
    pipe.preprocess()
    pipe.stage1a_smore()
    smore_out = os.path.join(cfg.tmp_path, "smore_output")
    assert os.path.exists(os.path.join(smore_out, "sub1_0000_img.nii.gz"))
    shutil.rmtree(smore_out)
    pipe.stage1a_smore()   # h5s exist; NIfTIs must reappear from them
    assert os.path.exists(os.path.join(smore_out, "sub1_0000_img.nii.gz"))
    assert os.path.exists(os.path.join(smore_out, "sub1_0000_seg.nii.gz"))
