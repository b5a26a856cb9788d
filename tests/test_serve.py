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


def test_serve_cli_end_to_end(tmp_path, rng, monkeypatch, capsys):
    """python -m rehrseg_tpu.serve: checkpoint + config -> segmentation."""
    import yaml
    from rehrseg_tpu.train import TrainState, nesterov_sgd
    from rehrseg_tpu.train import checkpoint as ckpt
    from rehrseg_tpu.train.optim import poly_epoch_schedule
    from rehrseg_tpu.serve import main as serve_main

    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    state = TrainState.create(params,
                              nesterov_sgd(poly_epoch_schedule(1e-3, 1, 1)))
    ckpt_dir = str(tmp_path / "segsr")
    ckpt.save_checkpoint(ckpt_dir, state, step=1)

    arch_yaml = {k: (list(v) if isinstance(v, tuple) else v)
                 for k, v in SMALL_ARCH.items()}
    arch_yaml["kernel_sizes"] = [list(k) for k in SMALL_ARCH["kernel_sizes"]]
    arch_yaml["strides"] = [list(s) for s in SMALL_ARCH["strides"]]
    cfg = {"data_path": str(tmp_path), "tmp_path": str(tmp_path / "t"),
           "checkpoint_path": str(tmp_path / "c"), "seg_path": "",
           "smore_initialization": False, "batch_size_sr": 1,
           "lr_sr": 1.0e-3, "n_patches": 1, "save_iters_sr": 1,
           "num_slices": 4, "patch_size": 16, "slice_thickness": 4.0,
           "target_thickness": 1.0, "blur_kernel": "rf-pulse-slr",
           "random_flip": False, "nnunet_transform": False,
           "enable_uncertainty": False, "batch_size_segsr": 1,
           "lr_segsr": 1.0e-3, "epochs": 1, "save_iters_segsr": 10,
           "enable_distillation": False, "lambda_l1": 0.0,
           "lambda_cosine": 0.0, "lambda_structure": 0.0,
           "arch_override": arch_yaml, "patch_size_zyx": [4, 16, 16]}
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    vol = rng.normal(size=(20, 20, 5)).astype(np.float32)
    in_path = str(tmp_path / "case_0000.nii.gz")
    nifti.save(nifti.NiftiImage(data=vol,
                                affine=np.diag([1.0, 1.0, 4.0, 1.0])),
               in_path)
    out_path = str(tmp_path / "case_seg.nii.gz")

    monkeypatch.setattr("sys.argv",
                        ["serve", in_path, "--ckpt", ckpt_dir,
                         "--config", cfg_path, "--out", out_path,
                         "--no-mirror"])
    serve_main()
    out = nifti.read_image_itk(out_path)
    assert out.array.shape == (5, 20, 20)
    assert set(np.unique(out.array)).issubset({0, 1})


def test_segmenter_with_mesh_matches_single_device(rng):
    from rehrseg_tpu.parallel import make_mesh, replicate

    mesh = make_mesh(8, spatial=2)
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)

    single = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                       slice_separation=4, mirror=True).segment(vol)
    sharded_seg = Segmenter(model=model,
                            params=replicate(params, mesh),
                            patch_size=(4, 16, 16), slice_separation=4,
                            mirror=True, mesh=mesh)
    with mesh:
        sharded = sharded_seg.segment(vol)
    # serving computes in bf16; spatial sharding reassociates the
    # InstanceNorm reductions, so near-tie voxels may flip — bit-exactness
    # in fp32 is pinned by tests/test_tta_mesh.py, here we bound the
    # bf16 tie-flip rate
    mismatch = np.mean(single != sharded)
    assert mismatch < 0.02, mismatch


def test_segmenter_streaming_matches_whole_volume(rng):
    """Segmenter(streaming=k) z-slab path == whole-volume path exactly,
    for both the LR mask and the HR head."""
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    whole = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                      slice_separation=4, mirror=False)
    stream = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                       slice_separation=4, mirror=False, streaming=2)
    vol = rng.normal(size=(10, 20, 20)).astype(np.float32)
    np.testing.assert_array_equal(whole.segment(vol), stream.segment(vol))
    lr1, hr1 = whole.segment(vol, hr=True)
    lr2, hr2 = stream.segment(vol, hr=True)
    np.testing.assert_array_equal(lr1, lr2)
    np.testing.assert_array_equal(hr1, hr2)


def test_sr_serving_cli(tmp_path, rng, monkeypatch):
    """--mode sr: flavr checkpoint + merged 2-channel NIfTI -> pseudo-HR
    _img/_seg NIfTIs (inference_flavr surface, sr_utils.py:137-196)."""
    import yaml
    from rehrseg_tpu.models import UNet3D
    from rehrseg_tpu.train import TrainState, onecycle_adam
    from rehrseg_tpu.train import checkpoint as ckpt
    from rehrseg_tpu.serve import main as serve_main, load_sr_from_checkpoint

    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 2)))
    tx, _ = onecycle_adam(1e-3, 1)
    ckpt_dir = str(tmp_path / "flavr")
    ckpt.save_checkpoint(ckpt_dir, TrainState.create(params, tx), step=1)

    img = rng.normal(size=(24, 24, 6)).astype(np.float32)
    lab = (rng.normal(size=(24, 24, 6)) > 0).astype(np.float32)
    merged = np.stack([img, lab], axis=-1)
    in_path = str(tmp_path / "case.nii.gz")
    nifti.save(nifti.NiftiImage(data=merged,
                                affine=np.diag([1.0, 1.0, 4.0, 1.0])),
               in_path)

    cfg = {"data_path": str(tmp_path), "tmp_path": str(tmp_path / "t"),
           "checkpoint_path": str(tmp_path / "c"), "seg_path": "",
           "num_slices": 4, "patch_size": 16, "slice_thickness": 4.0,
           "target_thickness": 1.0}
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out_base = str(tmp_path / "case_sr")
    monkeypatch.setattr("sys.argv",
                        ["serve", in_path, "--mode", "sr", "--ckpt", ckpt_dir,
                         "--config", cfg_path, "--out", out_base])
    serve_main()

    img_out = nifti.read_image_itk(out_base + "_img.nii.gz")
    seg_out = nifti.read_image_itk(out_base + "_seg.nii.gz")
    # 6 thin slices -> 4*(6+1-1) = 4*(z_pad-1)... FLAVR emits 4*(z-1)+4
    assert img_out.array.shape[1:] == (24, 24)
    assert img_out.array.shape[0] == seg_out.array.shape[0]
    assert abs(img_out.spacing[2] - 1.0) < 1e-6
    assert set(np.unique(seg_out.array)).issubset({0, 1})

    # API path with bf16 compute
    sr = load_sr_from_checkpoint(ckpt_dir, compute_dtype=jnp.bfloat16)
    sr.sr_file(in_path, str(tmp_path / "case_bf16"))
    assert (tmp_path / "case_bf16_img.nii.gz").exists()


def test_segmenter_aligned_tile_grid(rng):
    """Segmenter(tile_grid='aligned') runs the fused-kernel engine
    (interpret mode on CPU) and agrees with the parity engine on a
    structured volume whose grids coincide."""
    import pytest
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    vol = np.zeros((6, 24, 16), np.float32)
    vol[2:5, 8:20, 4:12] = 3.0
    vol += 0.05 * rng.normal(size=vol.shape).astype(np.float32)

    parity = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                       slice_separation=4, mirror=True)
    aligned = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                        slice_separation=4, mirror=True,
                        tile_grid="aligned")
    lr_p, hr_p = parity.segment(vol, hr=True)
    lr_a, hr_a = aligned.segment(vol, hr=True)
    assert lr_a.shape == lr_p.shape and hr_a.shape == hr_p.shape
    assert np.mean(lr_a != lr_p) < 1e-3
    # HR: the bf16-rounded gaussian shifts near-tie argmaxes on a
    # random-init model; real checkpoints produce decisive logits
    assert np.mean(hr_a != hr_p) < 5e-3

    with pytest.raises(ValueError, match="aligned"):
        Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                  mirror=False, tile_grid="aligned")


def test_segment_many_aligned_matches_single(rng):
    """segment_many must serve the SAME engine as segment() under
    tile_grid='aligned' (round-4 review: the batch path silently ran the
    parity engine)."""
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    seg = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                    slice_separation=4, mirror=True, tile_grid="aligned")
    vols = [rng.normal(size=(5, 20, 16)).astype(np.float32),
            rng.normal(size=(6, 16, 24)).astype(np.float32)]
    many = seg.segment_many(vols)
    for v, m in zip(vols, many):
        np.testing.assert_array_equal(m, seg.segment(v))


def test_segmenter_num_classes_3(rng):
    """num_classes threads from the loader/constructor into every engine
    accumulator (it was hardcoded to 2: a 3-class model shape-errored)."""
    model = SegModel(num_classes=3, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    seg = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                    slice_separation=4, mirror=False, num_classes=3)
    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)
    pred = seg.segment(vol)
    assert pred.shape == (6, 24, 24) and pred.max() <= 2
    lr, hr = seg.segment(vol, hr=True)
    assert hr.shape == (24, 24, 24)
    many = seg.segment_many([vol, vol])
    np.testing.assert_array_equal(many[0], pred)
    # streaming engine too
    stream = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                       slice_separation=4, mirror=False, num_classes=3,
                       streaming=2)
    np.testing.assert_array_equal(stream.segment(vol), pred)


def test_segment_many_streaming_falls_back(rng):
    """segment_many with streaming configured must not silently run the
    whole-volume accumulators the config was set to avoid."""
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    stream = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                       slice_separation=4, mirror=False, streaming=2)
    whole = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                      slice_separation=4, mirror=False)
    vols = [rng.normal(size=(8, 20, 20)).astype(np.float32)
            for _ in range(2)]
    for a, b in zip(stream.segment_many(vols), whole.segment_many(vols)):
        np.testing.assert_array_equal(a, b)


def test_segmenter_compute_dtype_constructor(rng):
    """compute_dtype is a real dataclass field (a bare class attribute made
    Segmenter(compute_dtype=...) a TypeError)."""
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    seg32 = Segmenter(model=model, params=params, patch_size=(4, 16, 16),
                      slice_separation=4, mirror=False,
                      compute_dtype=jnp.float32)
    leaf = jax.tree.leaves(seg32.params)[0]
    assert leaf.dtype == jnp.float32
    vol = rng.normal(size=(6, 24, 24)).astype(np.float32)
    assert seg32.segment(vol).shape == (6, 24, 24)
