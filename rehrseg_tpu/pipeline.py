"""3-stage REHRSeg pipeline orchestrator (train_all.py equivalent).

Capability parity with the reference orchestrator
(/root/reference/train_all.py:195-575): a linear, resumable pipeline with
filesystem-keyed caching —

  preprocess   merge image+label NIfTIs into 2-channel volumes with pixdim
               (1,1,4) (train_all.py:34-62);
  stage 1a     WDSR self-SR on in-plane patches (or cubic/nearest zoom
               fallback), per-subject h5 with the blurred training copies
               (train_all.py:265-330);
  stage 1b     FLAVR through-plane interpolation, warm-started from a public
               FLAVR checkpoint with stem/outconv/feature_fuse dropped
               (train_all.py:332-397);
  stage 1c     FLAVR + UASR uncertainty head, 20k steps, uncertainty volumes
               (train_all.py:399-455) — deliberately initialized from the
               stage-1b weights (fixing reference quirk Q2, which loaded the
               uncertainty model from its own yet-to-exist output dir);
  postprocess  bundle img/seg/uncertainty into stage-2 h5
               (train_all.py:457-462);
  stage 2      SegModel from plans.json + nnUNet warm start + SGD/Poly
               training with uncertainty-weighted CE and structural KD,
               periodic fold evaluation + orbax checkpoints
               (train_all.py:465-575; checkpointing fixes quirk Q1).

All stage checkpoints/outputs land in the same artifact layout as the
reference (tmp h5 stores; checkpoints/{smore,flavr,flavr_uncertainty,segsr}).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config, load_plans, load_splits
from .io import nifti
from .io.volume import (parse_image, write_h5, read_h5,
                        write_sr_niftis)
from .losses import calculate_dice
from .models import WDSR, UNet3D, SegModel, Distiller, arch_from_plans
from .data.datasets import (SRPatchDataset, SegSRDataset, BatchLoader,
                            PrefetchLoader)
from .data.normalize import zscore_normalization
from .infer.sliding_window import evaluate_case_volume
from .infer.sr_infer import (
    infer_wdsr_volume, infer_flavr_volume, postprocess_sr_volume,
    interpolate_pseudo_sr, zeroonenorm255, restore_intensity,
)
from .ops.bspline import zoom_axis_np
from .train import (
    TrainState, onecycle_adam, nesterov_sgd, poly_epoch_schedule,
    make_sr_train_step, make_seg_train_step, SegBatch,
)
from .train import checkpoint as ckpt
from .train import torch_import
from .utils.timer import StepTimer
from .utils.metrics import MetricsLogger
from .utils.preemption import PreemptionGuard, TrainingPreempted


def merge_images_and_labels(main_dir: str, output_dir: str) -> None:
    """Stack image + label into a 2-channel NIfTI, pixdim (1,1,4,1)
    (train_all.py:34-62)."""
    os.makedirs(output_dir, exist_ok=True)
    subjects = sorted(os.listdir(main_dir))
    print(f"Merging images and labels for a total of {len(subjects)} subjects")
    for name in subjects:
        out_path = os.path.join(output_dir, name)
        if os.path.exists(out_path):
            continue
        img_path = os.path.join(main_dir, name)
        label_path = img_path.replace("imagesTr", "labelsTr").replace(
            "_0000.nii.gz", ".nii.gz")
        if not os.path.exists(label_path):
            print(f"Segmentation label file not found for {name}")
            continue
        img = nifti.load(img_path).get_fdata(np.float32)
        lab = nifti.load(label_path).get_fdata(np.float32)
        if img.shape != lab.shape:
            print(f"Shape mismatch between main image {name} and label")
            continue
        merged = np.stack([img, lab], axis=-1).astype(np.float32)
        affine = np.diag([1.0, 1.0, 4.0, 1.0])
        nd = merged.ndim
        header = nifti.NiftiHeader(
            dim=(nd, *merged.shape, *([1] * (7 - nd))),
            pixdim=(1.0, 1.0, 1.0, 4.0, 1.0, 1.0, 1.0, 1.0),
            dtype=merged.dtype, affine=affine)
        nifti.save(nifti.NiftiImage(data=merged, affine=affine, header=header),
                   out_path)


def _train_sr_loop(model, tx, state, loader, step_fn, n_steps, save_iters,
                   weight_dir, log_every=100, lr_sim_sep=None, sched=None,
                   dp_mesh=None, hr_aug=False):
    """lr_sim_sep: when set, batches carry pre-resize LR sources and the
    rational downsample runs on device (data.device_sr_sim).

    dp_mesh: multi-host DP mesh — state replicates globally, each step's
    per-host batch slice assembles into a global array sharded over 'data'
    (parallel.multihost); None on single-host.

    hr_aug: device-side stage-1 intensity augmentation of the HR target
    image channel (data.device_aug.augment_sr_hr_batch) — replaces the
    host TrainingTransforms chain when extra.device_augment_sr is set.

    Loss/lr/step-time land in <weight_dir>/metrics.jsonl via MetricsLogger.
    The loader is closed on exit (including on error)."""
    if lr_sim_sep is not None:
        from .data.device_sr_sim import simulate_lr_batch
    import time as _time
    from .parallel import multihost as _mh
    mlog = MetricsLogger(weight_dir)
    sim_key = jax.random.key(17)
    hr_aug_fn = None
    aug_key = jax.random.key(23)
    if hr_aug:
        from .data.device_aug import augment_sr_hr_batch
        hr_aug_fn = jax.jit(augment_sr_hr_batch)
    if dp_mesh is not None:
        state = _mh.replicate_global(state, dp_mesh)
        sim_key = _mh.globalize_key(sim_key, dp_mesh)
        aug_key = _mh.globalize_key(aug_key, dp_mesh)
    start_it = int(state.step)
    last_log_it, last_log_t = start_it, _time.perf_counter()
    guard = PreemptionGuard()
    try:
      with guard:
        for it in range(start_it, n_steps):
            stop = guard.should_stop
            if dp_mesh is not None:
                # the save below is collective: act only on a pod-agreed
                # flag (OR across hosts, checked every 10 steps to keep the
                # host sync off the async dispatch path)
                stop = _mh.any_flag(stop) if it % 10 == 0 else False
            if stop:
                ckpt.save_checkpoint(weight_dir, state)
                raise TrainingPreempted(int(state.step))
            lr_b, hr_b = loader.next()
            if dp_mesh is not None:
                lr_b, hr_b = _mh.globalize_batch((lr_b, hr_b), dp_mesh)
            lr_b = jnp.asarray(lr_b)
            if hr_aug_fn is not None:
                aug_key, sub = jax.random.split(aug_key)
                hr_b = hr_aug_fn(sub, jnp.asarray(hr_b))
            if lr_sim_sep is not None:
                sim_key, sub = jax.random.split(sim_key)
                lr_b = simulate_lr_batch(sub, lr_b, float(lr_sim_sep))
            # async dispatch: no per-step sync, so host-side batch prep for
            # step i+1 overlaps the device's step i; the loss only
            # materializes at logging/checkpoint boundaries
            state, metrics = step_fn(state, lr_b, jnp.asarray(hr_b))
            if it > 0 and it % save_iters == 0:
                ckpt.save_checkpoint(weight_dir, state)
            if it % log_every == 0:
                loss = float(metrics["loss"])  # device sync point
                now = _time.perf_counter()
                dt = (now - last_log_t) / max(it - last_log_it, 1)
                last_log_it, last_log_t = it, now
                lr_now = float(sched(it)) if sched is not None else None
                mlog.log(it, loss=loss, step_time_s=dt,
                         **({"lr": lr_now} if lr_now is not None else {}))
                print(f"  step {it}/{n_steps} loss={loss:.4f} "
                      f"(~{dt * 1e3:.0f} ms/step)")
        # a SIGTERM in the final (up to) 9 steps lands between collective
        # checks; one last pod-agreed check so a late signal still
        # checkpoints and stops cleanly instead of running on into inference
        stop = guard.should_stop
        if dp_mesh is not None:
            stop = _mh.any_flag(stop)
        if stop:
            ckpt.save_checkpoint(weight_dir, state)
            raise TrainingPreempted(int(state.step))
    finally:
        if hasattr(loader, "close"):
            loader.close()
    ckpt.save_checkpoint(weight_dir, state, step=n_steps)
    return state


from .utils.cache import BoundedCache

_MODEL_FN_CACHE: BoundedCache = BoundedCache(maxsize=8)


def seg_model_fns(seg_model, packed: bool = True):
    """Cached (lr_fn, hr_fn) for a SegModel instance. The sliding-window jit
    keys on the model_fn object, so these must be stable across evaluate
    calls to avoid recompilation. The cache entry pins the model object so
    a GC'd model's id can never alias a new model onto stale forwards; the
    cache is LRU-bounded so a long-lived serving process that constructs
    many Segmenters doesn't pin compiled programs forever (an evicted
    model's reused id simply misses and recompiles)."""
    key = (id(seg_model), bool(packed))
    if key not in _MODEL_FN_CACHE:
        if packed:
            from .models.segnet_packed import segmodel_apply_packed
            arch = dict(seg_model.arch)
            upscale = seg_model.upscale

            # pallas_conv="cat": fused decoder-concat kernel, eval-only
            # (no VJP; the training step keeps XLA convs), measured
            # +2.4-3.2% engine-level (docs/BENCHMARKS.md round-5)
            def lr_fn(p, batch):
                return segmodel_apply_packed(arch, p, batch,
                                             pack_max_channels=64,
                                             pallas_conv="cat")

            def dual_fn(p, batch):
                return segmodel_apply_packed(arch, p, batch,
                                             pack_max_channels=64,
                                             dual=True, upscale=upscale,
                                             pallas_conv="cat")
        else:
            def lr_fn(p, batch):
                return seg_model.apply(p, batch)[0]

            def dual_fn(p, batch):
                return seg_model.apply(p, batch)

        _MODEL_FN_CACHE[key] = (seg_model, (lr_fn, dual_fn))
    return _MODEL_FN_CACHE[key][1]


def evaluate(seg_model, seg_params, patch_size, val_img_path, val_label_path,
             split, slice_separation, save_path=None, eval_hr=False,
             mirror=True, bad_cases=()):
    """Fold evaluation (train_all.py:154-193): per-subject + global dice.

    bad_cases: subjects to skip (the reference keeps an inline empty list,
    train_all.py:155,162)."""
    all_dice, all_pred, all_label = [], [], []

    lr_fn, dual_fn_full = seg_model_fns(seg_model)
    dual_fn = dual_fn_full if eval_hr else None

    for subject in split:
        if subject in bad_cases:
            continue
        img_path = os.path.join(val_img_path, subject + "_0000.nii.gz")
        lab_path = os.path.join(val_label_path, subject + ".nii.gz")
        vol = nifti.read_image_itk(img_path).array  # (z, y, x)
        lab = nifti.read_image_itk(lab_path).array.astype(np.uint8)
        pred_lr, pred_hr, dice = evaluate_case_volume(
            lr_fn, seg_params, vol.astype(np.float32), lab, patch_size,
            slice_separation=int(slice_separation), dual_model_fn=dual_fn,
            mirror=mirror)
        if save_path is not None:
            os.makedirs(os.path.join(save_path, "val"), exist_ok=True)
            ref = nifti.read_image_itk(img_path)
            out = nifti.ItkLikeImage(array=pred_lr, spacing=ref.spacing,
                                     origin=ref.origin, direction=ref.direction)
            nifti.write_image_itk(out, os.path.join(
                save_path, "val", f"{subject}_pred_lr.nii.gz"))
            if eval_hr:
                sp = ref.spacing
                out_hr = nifti.ItkLikeImage(
                    array=pred_hr,
                    spacing=(sp[0], sp[1], sp[2] / slice_separation),
                    origin=ref.origin, direction=ref.direction)
                nifti.write_image_itk(out_hr, os.path.join(
                    save_path, "val", f"{subject}_pred_hr.nii.gz"))
        all_pred.append(pred_lr.flatten())
        all_label.append(lab.flatten())
        all_dice.append(dice)
        print(f"Subject {subject}: {dice}")
    if not all_dice:
        raise ValueError(
            "evaluate(): no subjects evaluated — the validation split is "
            f"empty after skipping bad_cases ({len(split)} subjects in, "
            f"{len(bad_cases)} bad_cases)")
    print(f"Global dice: {calculate_dice(np.concatenate(all_pred), np.concatenate(all_label))}")
    print(f"Average dice: {sum(all_dice) / len(all_dice)}")
    return sum(all_dice) / len(all_dice)


class Pipeline:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        c = cfg
        self.merge_data_path = os.path.join(c.tmp_path, "data_merged")
        self.sr_h5_path = os.path.join(c.tmp_path, "data_merged_sr_h5")
        self.flavr_output_path = os.path.join(c.tmp_path, "flavr_output")
        self.segsr_h5_path = os.path.join(c.tmp_path, "data_merged_segsr_h5")
        self.smore_ckpt = os.path.join(c.checkpoint_path, "smore")
        self.flavr_ckpt = os.path.join(c.checkpoint_path, "flavr")
        self.flavr_unc_ckpt = os.path.join(c.checkpoint_path, "flavr_uncertainty")
        self.segsr_ckpt = os.path.join(c.checkpoint_path, "segsr")
        for p in (self.merge_data_path, self.sr_h5_path,
                  self.flavr_output_path, self.segsr_h5_path, self.smore_ckpt,
                  self.flavr_ckpt, self.flavr_unc_ckpt, self.segsr_ckpt):
            os.makedirs(p, exist_ok=True)

        # model-size overrides for small-scale runs/tests
        ex = c.extra or {}
        self.wdsr_blocks = int(ex.get("wdsr_n_resblocks", 16))
        self.wdsr_channels = int(ex.get("wdsr_num_channels", 32))
        self.arch_override = ex.get("arch_override")
        self.eval_mirror = bool(ex.get("eval_mirror", True))
        # bf16 compute / fp32 master-weight training is the TPU-first
        # default (train/precision.py; measured step times in
        # docs/BENCHMARKS.md); extra: {precision: fp32} restores the exact
        # reference-parity fp32 step
        self.precision = str(ex.get("precision", "bf16"))
        # stage-1 intensity augmentation on device (opt-in; the host
        # TrainingTransforms chain stays the parity oracle)
        self._sr_device_aug = bool(ex.get("device_augment_sr", False))
        # stage-1 volume-inference compute dtype: fp32 (reference parity,
        # default) or bf16 (~0.79 MFU device-resident, docs/BENCHMARKS.md;
        # outputs quantize to bf16 before intensity restore)
        dt = str(ex.get("sr_infer_dtype") or "").lower()
        if dt in ("bf16", "bfloat16"):
            self._sr_infer_dtype = jnp.bfloat16
        elif dt in ("", "fp32", "float32", "none"):
            self._sr_infer_dtype = None
        else:
            raise ValueError(f"unknown sr_infer_dtype {dt!r} "
                             "(use 'bf16' or 'fp32')")

        # multi-host DP (TPU pods): after cli's init_distributed() the
        # device list spans hosts; batches shard per host (BatchLoader
        # shard= + multihost.globalize_batch), params replicate globally,
        # and XLA all-reduces grads over ICI/DCN inside the same jitted
        # step. Single-process: mesh is None and everything below no-ops.
        from .parallel import multihost as _mh
        self._mh = _mh
        self.data_shard = _mh.data_shard()
        self.dp_mesh = None
        # spatial-sharded stage-2 training (extra: {mesh_spatial: N}): the
        # (data, spatial) mesh shards each patch's H dim over 'spatial'
        # devices through the jitted step — XLA inserts the conv halo
        # exchanges — so activations per device shrink by N: the TPU answer
        # to patches too large for one chip's HBM even packed+remat
        # (SURVEY §5 long-context analogue). The batch dim shards over
        # 'data' as usual; __graft_entry__.dryrun_multichip and
        # tests/test_train.py::test_spatial_sharded_seg_step pin parity.
        self.mesh_spatial = int((c.extra or {}).get("mesh_spatial", 1) or 1)
        self.seg_mesh = None
        if _mh.is_multihost() or self.mesh_spatial > 1:
            from .parallel import make_mesh
            if c.fold == "all":
                raise NotImplementedError(
                    "--fold all maps one fold per device and is exclusive "
                    "with multi-host DP and mesh_spatial; run one fold per "
                    "host/config with --fold k")
            self.seg_mesh = make_mesh(spatial=self.mesh_spatial)
            _mh.validate_global_batch(c.batch_size_segsr, self.seg_mesh,
                                      what="batch_size_segsr")
        if _mh.is_multihost():
            from .parallel import make_mesh
            self.dp_mesh = make_mesh()
            # fail at startup, not at step 1: DP shards the GLOBAL batch
            # over every device of the mesh 'data' axis
            _mh.validate_global_batch(c.batch_size_sr, self.dp_mesh,
                                      what="batch_size_sr")
            print(f"multi-host DP: {jax.process_count()} processes, "
                  f"{len(jax.devices())} global devices; host-side artifact "
                  f"writes/eval run on process 0 (tmp/checkpoint paths must "
                  f"be shared storage)")

    def _agree(self, flag: bool) -> bool:
        """Primary's filesystem-derived decision, broadcast pod-wide.

        Stage-skip / resume branches must be identical on every host: on
        shared network storage, attribute-cache skew can make
        ``os.path.exists`` disagree across hosts, and one host taking an
        early return while another enters the stage produces mismatched
        collective barrier/save sequences (deadlock in
        sync_global_devices). No-op single-host."""
        if self.dp_mesh is None:
            return bool(flag)
        return self._mh.broadcast_scalar(1.0 if flag else 0.0) > 0.5

    def _make_loader(self, ds, batch_size: int):
        """Training batch loader: single background thread by default;
        extra.loader_workers: N forks N worker PROCESSES building batches
        in parallel (reference stage-2 DataLoader num_workers=4,
        train_all.py:508). The worker path draws per-sample seeds, so its
        sample stream differs from (but is as-distributed as) the
        single-thread stream; see data.datasets.MultiprocessBatchLoader."""
        workers = int((self.cfg.extra or {}).get("loader_workers", 0) or 0)
        if (self.dp_mesh is None
                and bool((self.cfg.extra or {}).get("device_sampler", True))):
            # TPU-first: HBM-resident volumes + on-device crop/flip remove
            # host prep from the loop entirely (the measured input-bound
            # fix, docs/BENCHMARKS.md loader study). Bit-identical stream
            # to the host loader (tests/test_device_sampler.py); datasets
            # outside its covered mode (thin-z WDSR, host LR-sim, host
            # transforms) fall back to the host loaders below.
            from .data.device_sampler import DeviceSRPatchSampler
            try:
                return DeviceSRPatchSampler(ds, batch_size,
                                            shard=self.data_shard)
            except (ValueError, AttributeError):
                pass
        if workers > 0:
            from .data.datasets import MultiprocessBatchLoader
            return MultiprocessBatchLoader(ds, batch_size,
                                           num_workers=workers,
                                           shard=self.data_shard)
        return PrefetchLoader(BatchLoader(ds, batch_size,
                                          shard=self.data_shard))

    # ------------------------------------------------------------ stage 0

    def split_subjects(self):
        c = self.cfg
        if c.fold is None or c.fold == "all":
            # fold="all": stage 1 is shared across folds and trains on every
            # subject; per-fold splits apply in stage2_segsr_all_folds
            return [s.replace("_0000.nii.gz", "").replace(".nii.gz", "")
                    for s in sorted(os.listdir(c.data_path))], None
        splits = load_splits(c.seg_path)
        return splits[c.fold]["train"], splits[c.fold]["val"]

    def preprocess(self):
        if self._mh.is_primary():
            merge_images_and_labels(self.cfg.data_path, self.merge_data_path)
        self._mh.barrier("preprocess")

    # ------------------------------------------------------------ stage 1a

    def stage1a_smore(self):
        c = self.cfg
        train_subjects, _ = self.split_subjects()
        sep = c.slice_separation
        subjects = sorted(os.listdir(self.merge_data_path))
        done = all(os.path.exists(os.path.join(self.sr_h5_path, s + ".h5"))
                   for s in subjects)
        if done and c.smore_initialization:
            # SMORE branch completeness includes the per-subject NIfTI
            # artifacts (backfilled from the h5 on resume, below)
            done = all(os.path.exists(os.path.join(
                c.tmp_path, "smore_output",
                s.replace(".nii.gz", "") + "_img.nii.gz")) for s in subjects)
        if self._agree(done and bool(subjects)):
            return

        if not c.smore_initialization:
            # traditional interpolation fallback (train_all.py:321-330);
            # no SMORE NIfTIs in this branch, matching the reference
            if self._mh.is_primary():
              for subject in subjects:
                h5_path = os.path.join(self.sr_h5_path, subject + ".h5")
                if os.path.exists(h5_path):
                    continue
                image, _, _, blur_fwhm, *_ = parse_image(
                    os.path.join(self.merge_data_path, subject),
                    c.slice_thickness, c.target_thickness)
                up_img, up_lab = interpolate_pseudo_sr(
                    image[..., 0], image[..., 1], sep)
                fx, fy = postprocess_sr_volume(up_img, blur_fwhm, c.blur_kernel)
                write_h5(h5_path, img_hr=up_img[..., None],
                         label_hr=up_lab[..., None].astype(np.uint8),
                         image_x_rgb=fx, image_y_rgb=fy)
            self._mh.barrier("stage1a-interp")
            return

        # sr_mode (reference inference_smore, sr_utils.py:33-97): 'img+seg'
        # (pipeline default, train_all.py:313) SRs the 2-channel image+label
        # stack; 'img' is the single-channel image-only mode
        sr_mode = str((c.extra or {}).get("sr_mode", "img+seg"))
        n_ch = 1 if sr_mode == "img" else 2
        model = WDSR(out_channel=n_ch, n_resblocks=self.wdsr_blocks,
                     num_channels=self.wdsr_channels, scale=sep)
        lr_patch = [c.patch_size, c.patch_size]
        patch_size = model.calc_out_patch_size(lr_patch)
        x0 = jnp.zeros((1, lr_patch[0], lr_patch[1], n_ch))
        params = model.init(jax.random.key(0), x0)

        n_steps = int(np.ceil(c.n_patches / c.batch_size_sr))
        tx, sched_sr = onecycle_adam(c.lr_sr, n_steps)
        state = TrainState.create(params, tx)
        if self._agree(ckpt.has_checkpoint(self.smore_ckpt)):
            print("NETWORK SMORE TRAINED, LOADING LAST WEIGHTS")
            state = ckpt.restore_checkpoint(self.smore_ckpt, state)
        if int(state.step) < n_steps:
            print("TRAINING NETWORK SMORE")
            dev_sim = bool((c.extra or {}).get("device_lr_sim", False))
            ds = SRPatchDataset(self.merge_data_path, train_subjects,
                                c.slice_thickness, c.target_thickness, None,
                                c.blur_kernel, patch_size, c.random_flip,
                                blur=True, nnunet_transform=False,
                                device_lr_sim=dev_sim, channels=n_ch)
            loader = self._make_loader(ds, c.batch_size_sr)
            step_fn = make_sr_train_step(model, tx, enable_uncertainty=False,
                                         slice_separation=sep, num_slices=1,
                                         precision=self.precision)
            state = _train_sr_loop(model, tx, state, loader, step_fn, n_steps,
                                   c.save_iters_sr, self.smore_ckpt,
                                   lr_sim_sep=sep if dev_sim else None,
                                   sched=sched_sr, dp_mesh=self.dp_mesh)

        print("INFERENCE NETWORK SMORE")
        smore_out = os.path.join(c.tmp_path, "smore_output")
        os.makedirs(smore_out, exist_ok=True)
        if self._mh.is_primary():
          params = (self._mh.localize(state.params)
                    if self.dp_mesh is not None else state.params)
          for subject in sorted(os.listdir(self.merge_data_path)):
            h5_path = os.path.join(self.sr_h5_path, subject + ".h5")
            out_base = os.path.join(smore_out,
                                    subject.replace(".nii.gz", ""))
            img_nii = out_base + "_img.nii.gz"
            if os.path.exists(h5_path):
                if not os.path.exists(img_nii):
                    ref = nifti.read_image_itk(
                        os.path.join(c.data_path, subject))
                    # resume path: a run interrupted between the h5 write
                    # and the NIfTI write (or upgraded from a pre-NIfTI
                    # version) backfills the SMORE artifacts from the h5
                    img_hr, label_hr = read_h5(h5_path, "img_hr", "label_hr")
                    write_sr_niftis(
                        ref, out_base, sep, img_xyz=img_hr[..., 0],
                        seg_xyz=(label_hr[..., 0]
                                 if "seg" in sr_mode else None))
                continue
            ref = nifti.read_image_itk(os.path.join(c.data_path, subject))
            image, _, _, blur_fwhm, *_ = parse_image(
                os.path.join(self.merge_data_path, subject),
                c.slice_thickness, c.target_thickness)
            sr = infer_wdsr_volume(
                model, params,
                image[..., :n_ch].astype(np.float32), sep)
            img_hr = sr[..., 0]
            if n_ch == 2:
                label_hr = (sr[..., 1] > 0).astype(np.uint8)
            else:
                # 'img' mode has no SR'd label channel; nearest-interpolate
                # the merged label so the stage-2 h5 store stays complete
                # (the reference pipeline never runs 'img', train_all.py:313)
                label_hr = zoom_axis_np(image[..., 1] if image.shape[-1] > 1
                                        else np.zeros_like(image[..., 0]),
                                        sep, axis=2, order=0).astype(np.uint8)
                if label_hr.shape[2] < img_hr.shape[2]:
                    label_hr = np.pad(
                        label_hr, ((0, 0), (0, 0),
                                   (0, img_hr.shape[2] - label_hr.shape[2])),
                        mode="edge")
                label_hr = label_hr[:, :, :img_hr.shape[2]]
            # per-subject SMORE NIfTI artifacts (inference_smore's surface,
            # sr_utils.py:77-101): _img always, _seg when sr_mode has 'seg'
            write_sr_niftis(ref, out_base, sep, img_xyz=img_hr,
                            seg_xyz=label_hr if "seg" in sr_mode else None)
            fx, fy = postprocess_sr_volume(img_hr, blur_fwhm, c.blur_kernel)
            write_h5(h5_path, img_hr=img_hr[..., None],
                     label_hr=label_hr[..., None],
                     image_x_rgb=fx, image_y_rgb=fy)
        self._mh.barrier("stage1a")

    # ------------------------------------------------------------ stage 1b/1c

    def _make_flavr(self, use_uncertainty: bool):
        c = self.cfg
        return UNet3D(img_channels=2, n_inputs=c.num_slices,
                      n_outputs=int(c.slice_separation),
                      use_uncertainty=use_uncertainty)

    def _flavr_dataset(self, model):
        c = self.cfg
        dev_sim = bool((c.extra or {}).get("device_lr_sim", False))
        lr_patch = [c.num_slices, c.patch_size, c.patch_size]
        patch_size = model.calc_out_patch_size(lr_patch)
        # device_augment_sr: run the stage-1 intensity chain on device
        # (augment_sr_hr_batch in the training loop) instead of the host
        # TrainingTransforms path
        host_tf = c.nnunet_transform and not self._sr_device_aug
        return SRPatchDataset(self.sr_h5_path, self.split_subjects()[0],
                              c.slice_thickness, c.target_thickness, None,
                              c.blur_kernel, patch_size, c.random_flip,
                              blur=True, nnunet_transform=host_tf,
                              device_lr_sim=dev_sim)

    def stage1b_flavr(self):
        c = self.cfg
        sep = c.slice_separation
        model = self._make_flavr(False)
        x0 = jnp.zeros((1, c.num_slices, c.patch_size, c.patch_size, 2))
        params = model.init(jax.random.key(0), x0)
        if c.pretrain_path and os.path.exists(c.pretrain_path):
            sd = torch_import.load_torch_state_dict(c.pretrain_path)
            params, loaded, report = torch_import.import_flavr(params, sd)
            print(f"FLAVR warm start: loaded {len(loaded)} tensors "
                  f"(match {report.match_rate:.0%})")

        n_steps = int(np.ceil(c.n_patches / c.batch_size_sr))
        tx, sched_sr = onecycle_adam(c.lr_sr, n_steps)
        state = TrainState.create(params, tx)
        if self._agree(ckpt.has_checkpoint(self.flavr_ckpt)):
            print("NETWORK FLAVR TRAINED, LOADING LAST WEIGHTS")
            state = ckpt.restore_checkpoint(self.flavr_ckpt, state)
        if int(state.step) < n_steps:
            print("TRAINING NETWORK FLAVR")
            dev_sim = bool((c.extra or {}).get("device_lr_sim", False))
            loader = self._make_loader(self._flavr_dataset(model),
                                       c.batch_size_sr)
            step_fn = make_sr_train_step(model, tx, enable_uncertainty=False,
                                         slice_separation=sep,
                                         num_slices=c.num_slices,
                                         precision=self.precision)
            state = _train_sr_loop(model, tx, state, loader, step_fn, n_steps,
                                   c.save_iters_sr, self.flavr_ckpt,
                                   lr_sim_sep=sep if dev_sim else None,
                                   sched=sched_sr, dp_mesh=self.dp_mesh,
                                   hr_aug=self._sr_device_aug)

        print("INFERENCE NETWORK FLAVR")
        self._flavr_inference(model, state.params, uncertainty=False)
        return model, state

    def _flavr_inference(self, model, params, uncertainty: bool):
        c = self.cfg
        sep = c.slice_separation
        if not self._mh.is_primary():
            self._mh.barrier(f"flavr-infer-{uncertainty}")
            return
        if self.dp_mesh is not None:
            # host-local copies: the inference jits then carry no
            # collectives, so the primary can run them alone
            params = self._mh.localize(params)
        # 1-deep software pipeline over subjects: subject N's device
        # compute is dispatched BEFORE subject N-1's fetch/postprocess/
        # NIfTI-gzip write, so host IO and chip compute overlap (the
        # reference runs each volume start-to-finish serially,
        # sr_utils.py:98-175). Writes still land in subject order, so the
        # skip-if-exists resume contract is unchanged.
        from .infer.sr_infer import infer_flavr_volume_async

        def _flush(pend):
            finalize, subject_, ref_, out_base_, omin, omax = pend
            out = restore_intensity(finalize(), omin, omax)
            if not uncertainty:
                write_sr_niftis(ref_, out_base_, sep, img_xyz=out[..., 0],
                                seg_xyz=out[..., 1])
                self._log_sr_psnr(subject_, out[..., 0].transpose(2, 1, 0))
            else:
                write_sr_niftis(ref_, out_base_, sep, unc_xyz=out[..., 0])

        pending = None
        for subject in sorted(os.listdir(self.merge_data_path)):
            base = os.path.join(self.flavr_output_path, subject)
            img_file = base.replace(".nii.gz", "_img.nii.gz")
            seg_file = base.replace(".nii.gz", "_seg.nii.gz")
            unc_file = base.replace(".nii.gz", "_uncertainty.nii.gz")
            # skip-if-exists must key on ALL artifacts of this pass: img is
            # written before seg, so a crash between the two writes would
            # otherwise skip the subject forever with seg missing
            if (os.path.exists(unc_file) if uncertainty
                    else (os.path.exists(img_file)
                          and os.path.exists(seg_file))):
                continue
            image, _, _, _, _, _, orig_min, orig_max = parse_image(
                os.path.join(self.merge_data_path, subject),
                c.slice_thickness, c.target_thickness)
            ref = nifti.read_image_itk(
                os.path.join(self.cfg.data_path, subject))
            out_base = base.replace(".nii.gz", "")
            finalize = infer_flavr_volume_async(
                model, params, image.astype(np.float32), sep,
                out_index=1 if uncertainty else 0,
                compute_dtype=self._sr_infer_dtype)
            if pending is not None:
                _flush(pending)
            pending = (finalize, subject, ref, out_base,
                       orig_min, orig_max)
        if pending is not None:
            _flush(pending)
        self._mh.barrier(f"flavr-infer-{uncertainty}")

    def _log_sr_psnr(self, subject: str, sr_img_zyx: np.ndarray):
        """Stage-1 SR quality metric (BASELINE acceptance: "Dice & PSNR
        parity"): when an HR ground-truth volume exists for this subject
        (config extra ``hr_reference_path`` — synthetic-test datasets have
        one; clinical LR-only data doesn't), compute PSNR of the SR image
        against it and append it to <flavr_ckpt>/metrics.jsonl."""
        from .losses import calculate_psnr

        hr_dir = (self.cfg.extra or {}).get("hr_reference_path")
        if not hr_dir:
            return
        hr_path = os.path.join(hr_dir, subject)
        if not os.path.exists(hr_path):
            return
        hr = nifti.read_image_itk(hr_path).array.astype(np.float32)  # (z,y,x)
        z = min(hr.shape[0], sr_img_zyx.shape[0])
        if hr.shape[1:] != sr_img_zyx.shape[1:]:
            print(f"PSNR skip {subject}: in-plane shape mismatch "
                  f"{hr.shape} vs {sr_img_zyx.shape}")
            return
        rng_ = float(hr.max() - hr.min()) or 1.0
        psnr = calculate_psnr(sr_img_zyx[:z], hr[:z], data_range=rng_)
        MetricsLogger(self.flavr_ckpt).log(0, subject=subject, psnr=psnr)
        print(f"SR PSNR {subject}: {psnr:.2f} dB")

    def stage1c_uncertainty(self, init_state: TrainState | None = None):
        c = self.cfg
        if not c.enable_uncertainty:
            return None, None
        sep = c.slice_separation
        model = self._make_flavr(True)
        x0 = jnp.zeros((1, c.num_slices, c.patch_size, c.patch_size, 2))
        params = model.init(jax.random.key(0), x0)
        # deliberate fix of reference quirk Q2: warm-start the UASR model
        # from the trained stage-1b FLAVR (dropping outconv/feature_fuse —
        # the reference's intended key filter, train_all.py:429-435)
        if self._agree(ckpt.has_checkpoint(self.flavr_ckpt)):
            flavr_plain = self._make_flavr(False)
            plain_params = flavr_plain.init(jax.random.key(0), x0)
            tx0, _ = onecycle_adam(c.lr_sr, 1)
            plain_state = TrainState.create(plain_params, tx0)
            plain_state = ckpt.restore_checkpoint(self.flavr_ckpt, plain_state)
            src = plain_state.params["params"]
            dst = jax.tree_util.tree_map(lambda x: x, params)  # copy
            import flax
            dst = flax.core.unfreeze(dst)
            for key in src:
                if key in ("outconv", "feature_fuse"):
                    continue
                if key in dst["params"]:
                    dst["params"][key] = src[key]
            params = dst

        n_steps = int(c.uncertainty_steps)
        tx, sched_sr = onecycle_adam(c.lr_sr, n_steps)
        state = TrainState.create(params, tx)
        if self._agree(ckpt.has_checkpoint(self.flavr_unc_ckpt)):
            state = ckpt.restore_checkpoint(self.flavr_unc_ckpt, state)
        if int(state.step) < n_steps:
            print("TRAINING NETWORK FLAVR WITH UNCERTAINTY")
            dev_sim = bool((c.extra or {}).get("device_lr_sim", False))
            loader = self._make_loader(self._flavr_dataset(model),
                                       c.batch_size_sr)
            step_fn = make_sr_train_step(model, tx, enable_uncertainty=True,
                                         slice_separation=sep,
                                         num_slices=c.num_slices,
                                         precision=self.precision)
            state = _train_sr_loop(model, tx, state, loader, step_fn, n_steps,
                                   c.save_iters_sr, self.flavr_unc_ckpt,
                                   lr_sim_sep=sep if dev_sim else None,
                                   sched=sched_sr, dp_mesh=self.dp_mesh,
                                   hr_aug=self._sr_device_aug)
        print("INFERENCE NETWORK FLAVR WITH UNCERTAINTY")
        self._flavr_inference(model, state.params, uncertainty=True)
        return model, state

    # ------------------------------------------------------------ postprocess

    def postprocess_flavr(self):
        """Bundle img/seg/uncertainty into stage-2 h5 (train_all.py:457-462,
        sr_utils.py:284-304): image is 0-255 normalized and slice-profile
        re-blurred in-plane."""
        c = self.cfg
        if not self._mh.is_primary():
            self._mh.barrier("postprocess-flavr")
            return
        for subject in sorted(os.listdir(self.merge_data_path)):
            h5_path = os.path.join(
                self.segsr_h5_path, subject.replace(".nii.gz", ".h5"))
            if os.path.exists(h5_path):
                continue
            base = os.path.join(self.flavr_output_path, subject)
            image, _, _, blur_fwhm, *_ = parse_image(
                base.replace(".nii.gz", "_img.nii.gz"), c.slice_separation, 1.0)
            image = zeroonenorm255(image)
            label, *_ = parse_image(
                base.replace(".nii.gz", "_seg.nii.gz"), c.slice_separation, 1.0)
            unc_file = base.replace(".nii.gz", "_uncertainty.nii.gz")
            if os.path.exists(unc_file):
                unc, *_ = parse_image(unc_file, c.slice_separation, 1.0)
                unc = zeroonenorm255(unc).astype(np.uint8)
            else:
                unc = np.zeros_like(label)
            from .ops.blur import parse_kernel, blur_axis_np
            kernel = parse_kernel(None, c.blur_kernel, blur_fwhm)
            zxy = image.transpose(2, 0, 1)[:, None]  # (z, 1, x, y)
            blurred = blur_axis_np(zxy.astype(np.float32), kernel, axis=2)
            image = blurred[:, 0].transpose(1, 2, 0)
            write_h5(h5_path, img=image, seg=label, uncertainty=unc)
        self._mh.barrier("postprocess-flavr")

    # ------------------------------------------------------------ stage 2

    def _seg_arch_and_patches(self):
        """Arch kwargs + patch sizes, from arch_override or plans.json.

        Reference patch math (train_all.py:469-470): patch (x, y, z) =
        reversed plans patch; crop patch is (x+64, y+64, z)."""
        c = self.cfg
        if self.arch_override is not None:
            arch = dict(self.arch_override)
            arch["kernel_sizes"] = tuple(tuple(k) for k in arch["kernel_sizes"])
            arch["strides"] = tuple(tuple(s) for s in arch["strides"])
            arch["features_per_stage"] = tuple(arch["features_per_stage"])
            arch["n_conv_per_stage"] = tuple(arch["n_conv_per_stage"])
            arch["n_conv_per_stage_decoder"] = tuple(arch["n_conv_per_stage_decoder"])
            patch_size_zyx = list(self.cfg.extra["patch_size_zyx"])
        else:
            plans = load_plans(c.seg_path)
            arch, patch_size_zyx = arch_from_plans(plans)
        patch_xyz = patch_size_zyx[::-1]
        patch_ori = [patch_xyz[0] + 64, patch_xyz[1] + 64, patch_xyz[2]]
        return arch, patch_size_zyx, patch_xyz, patch_ori

    def _init_seg_params(self, seg, arch, patch_size_zyx, fold):
        """Init SegModel params, warm-started from the fold's nnUNet
        checkpoint when present (train_all.py:496-499)."""
        seg_params = seg.init(jax.random.key(0),
                              jnp.zeros((1, patch_size_zyx[0], 32, 32, 1)))
        resume_seg = os.path.join(self.cfg.seg_path, f"fold_{fold}",
                                  "checkpoint_final.pth")
        if os.path.exists(resume_seg):
            sd = torch_import.load_torch_state_dict(resume_seg)
            # fail-loud on a <90% key match unless the config opts out —
            # a silently-partial nnUNet warm start trains from random
            # weights while claiming otherwise (VERDICT r3 weak #4)
            ap = (self.cfg.extra or {}).get("allow_partial_warmstart")
            seg_params, loaded, report = torch_import.import_segmodel(
                seg_params, sd, arch,
                allow_partial=bool(ap) if ap is not None else None)
            print(f"nnUNet warm start (fold {fold}): "
                  f"loaded {len(loaded)} tensors "
                  f"(match {report.match_rate:.0%})")
        return seg_params

    def _make_distiller(self, arch):
        c = self.cfg
        student_dim = arch["features_per_stage"][1]
        dist = Distiller(student_dim=student_dim, teacher_dim=64,
                         lambda_l1=c.lambda_l1,
                         lambda_cosine=c.lambda_cosine,
                         lambda_structure=c.lambda_structure)
        dparams = dist.init(jax.random.key(3),
                            jnp.zeros((1, 2, 8, 8, student_dim)),
                            jnp.zeros((1, 2, 8, 8, 64)))
        return dist, dparams

    def _ensure_flavr_teacher(self, flavr_model, flavr_params):
        """Load the frozen FLAVR teacher from the latest stage-1 checkpoint
        when stage 2 runs standalone."""
        c = self.cfg
        if flavr_model is not None:
            return flavr_model, flavr_params
        flavr_model = self._make_flavr(c.enable_uncertainty)
        xf = jnp.zeros((1, c.num_slices, c.patch_size, c.patch_size, 2))
        fp = flavr_model.init(jax.random.key(0), xf)
        tx0, _ = onecycle_adam(c.lr_sr, 1)
        fstate = TrainState.create(fp, tx0)
        src = (self.flavr_unc_ckpt
               if self._agree(ckpt.has_checkpoint(self.flavr_unc_ckpt))
               else self.flavr_ckpt)
        if self._agree(ckpt.has_checkpoint(src)):
            fstate = ckpt.restore_checkpoint(src, fstate)
        return flavr_model, fstate.params

    def _remat_mode(self):
        """Stage-2 remat policy (extra: {remat: auto|all|hires|none}).
        Default 'auto': AOT-probe none -> hires against the device's
        reported HBM budget and take the first that fits, falling back to
        'all' (guaranteed fit) on probe failure — 'none' measured ~15%%
        faster when it fits (235 vs 275 ms/step with the 'auto' head,
        8.4 GiB non-distilled peak; see select_remat_mode and
        docs/BENCHMARKS.md "CE-gather fix"). Explicit modes skip the
        probe compiles."""
        mode = str((self.cfg.extra or {}).get("remat", "auto")).lower()
        if mode in ("none", "false", "off"):
            return False
        if mode == "hires":
            return "hires"
        if mode == "auto":
            return "auto"
        return True

    def _sr_head_form(self):
        """Packed SR-head emission for the TRAIN step (extra:
        {sr_head_form: auto|cell4|legacy}). Default 'auto' — since the
        one-hot CE fix (losses.py) freed ~11.7 GiB of gather/scatter live
        buffers it is both the fastest and the smallest form (measured
        271-275 ms/step, 4.30 GiB peak at production geometry —
        experiments/stage2_head_mem.py). cell4/legacy remain as fallbacks
        for memory-tighter geometries."""
        return str((self.cfg.extra or {}).get("sr_head_form",
                                              "auto")).lower()

    def stage2_segsr(self, flavr_model=None, flavr_params=None):
        c = self.cfg
        sep = int(c.slice_separation)
        arch, patch_size_zyx, patch_xyz, patch_ori = self._seg_arch_and_patches()

        seg = SegModel(num_classes=2, upscale=sep, input_channels=1, arch=arch)
        seg_params = self._init_seg_params(seg, arch, patch_size_zyx, c.fold)

        dist = None
        params = seg_params
        if c.enable_distillation:
            dist, dparams = self._make_distiller(arch)
            params = {"seg": seg_params, "distiller": dparams}
            flavr_model, flavr_params = self._ensure_flavr_teacher(
                flavr_model, flavr_params)

        train_subjects, val_subjects = self.split_subjects()
        # device-side augmentation is the DEFAULT: the host scipy order-3
        # spatial chain costs ~0.4 s/sample on this class of host and starves
        # the chip; the host path stays available (device_augment: false) as
        # the parity oracle (reference DataLoader workers, train_all.py:508)
        device_augment = bool((c.extra or {}).get("device_augment", True))
        ds = SegSRDataset(self.segsr_h5_path, train_subjects,
                          c.slice_thickness, c.target_thickness, patch_ori,
                          patch_xyz, c.random_flip, c.enable_uncertainty,
                          device_augment=device_augment)
        loader = self._make_loader(ds, c.batch_size_segsr)
        aug_fn = None
        if device_augment:
            from .data.device_aug import augment_seg_batch
            patch_hw = (patch_xyz[1], patch_xyz[0])  # in-plane (y, x)
            aug_fn = jax.jit(lambda k, a, b, cc, d: augment_seg_batch(
                k, a, b, cc, d, patch_hw=patch_hw,
                enable_uncertainty=c.enable_uncertainty))
        aug_key = jax.random.key(0)
        iters_per_epoch = max(len(ds) // c.batch_size_segsr, 1)
        sched = poly_epoch_schedule(c.lr_segsr, c.epochs, iters_per_epoch)
        if c.enable_distillation:
            # uniform params chain (reference train_all.py:511-513)
            tx = nesterov_sgd(sched)
        else:
            # per-group LR: sr_head full LR; rest LR/10, no weight decay
            # (separate_weight_extensive_params, train_all.py:64-83,510)
            from .train.optim import nesterov_sgd_grouped
            tx = nesterov_sgd_grouped(c.lr_segsr, sched)
        state = TrainState.create(params, tx)
        if self._agree(ckpt.has_checkpoint(self.segsr_ckpt)):
            state = ckpt.restore_checkpoint(self.segsr_ckpt, state)

        def make_step(remat_mode):
            return make_seg_train_step(
                seg, tx, enable_uncertainty=c.enable_uncertainty,
                enable_distillation=c.enable_distillation,
                flavr_model=flavr_model, distiller=dist,
                teacher_window_chunk=(c.extra or {}).get(
                    "teacher_window_chunk"),
                remat=remat_mode, precision=self.precision,
                sr_head_form=self._sr_head_form())

        remat_mode = self._remat_mode()
        # 'auto' resolves lazily on the first batch (exact prod avals +
        # shardings); every host must agree, so the primary probes and the
        # decision broadcasts (compile results could in principle differ
        # under host-skewed caches)
        step_fn = None if remat_mode == "auto" else make_step(remat_mode)

        total_steps = c.epochs * iters_per_epoch
        batch_spec = None
        if self.seg_mesh is not None:
            # multi-host DP and/or spatial sharding: replicate state + the
            # frozen teacher over the (data, spatial) mesh; batches shard
            # batch-dim over 'data' and the patch H dim over 'spatial'
            # (grad all-reduce and conv halo exchanges both come from XLA's
            # SPMD partitioner inside the same jitted step)
            from jax.sharding import PartitionSpec as P
            batch_spec = (P("data", None, "spatial")
                          if self.mesh_spatial > 1 else P("data"))
            state = self._mh.replicate_any(state, self.seg_mesh)
            if flavr_params is not None:
                flavr_params = self._mh.replicate_any(
                    flavr_params, self.seg_mesh)
            aug_key = self._mh.globalize_key(aug_key, self.seg_mesh)
        mlog = MetricsLogger(self.segsr_ckpt)
        # resume keeps the best-by-val-dice watermark: metrics.jsonl
        # persists every eval, so a restarted run must not let its first
        # (likely worse) eval clobber the 'best' checkpoint tag
        best_dice = (mlog.max_on_disk("val_dice")
                     if self._mh.is_primary() else 0.0)
        best_dice = self._mh.broadcast_scalar(best_dice)
        timer = StepTimer()
        profile_dir = (c.extra or {}).get("profile_dir")
        print(f"TRAINING NETWORK REHRSeg ({total_steps} steps)")
        guard = PreemptionGuard()
        start_it = int(state.step)  # snapshot: state.step advances per step
        prof_on = False
        try:
          with guard:
            for it in range(start_it, total_steps):
              if profile_dir and it == start_it + 5:
                  # steady-state capture: past compile + warmup
                  jax.profiler.start_trace(profile_dir)
                  prof_on = True
              if prof_on and it == start_it + 10:
                  jax.profiler.stop_trace()
                  prof_on = False
              stop = guard.should_stop
              if self.dp_mesh is not None:
                  stop = (self._mh.any_flag(stop) if it % 10 == 0 else False)
              if stop:
                  ckpt.save_checkpoint(self.segsr_ckpt, state)
                  raise TrainingPreempted(int(state.step))
              timer.start()
              b = loader.next()
              if self.seg_mesh is not None:
                  b = self._mh.place_global(b, self.seg_mesh, batch_spec)
              if aug_fn is not None:
                  aug_key, sub = jax.random.split(aug_key)
                  img_a, llr_a, lhr_a, unc_a = aug_fn(
                      sub, jnp.asarray(b["img"]), jnp.asarray(b["label_lr"]),
                      jnp.asarray(b["label_hr"]),
                      jnp.asarray(b["uncertainty_lr"]))
                  batch = SegBatch(img_a, llr_a, lhr_a, unc_a)
              else:
                  batch = SegBatch(jnp.asarray(b["img"]),
                                   jnp.asarray(b["label_lr"]),
                                   jnp.asarray(b["label_hr"]),
                                   jnp.asarray(b["uncertainty_lr"]))
              if step_fn is None:
                  from .train.seg_trainer import (select_remat_mode,
                                                  REMAT_WIRE, REMAT_UNWIRE)
                  if self._mh.is_primary():
                      mode, why = select_remat_mode(
                          make_step, state, flavr_params, batch)
                      print(f"remat auto-select: {mode!r} ({why})")
                  else:
                      mode = True  # overwritten by the broadcast below
                  code = self._mh.broadcast_scalar(float(REMAT_WIRE[mode]))
                  step_fn = make_step(REMAT_UNWIRE[int(code)])
              state, metrics = step_fn(state, flavr_params, batch)
              timer.stop()
              if (it + 1) % 100 == 0 or it + 1 == total_steps:
                  mlog.log(it + 1, loss=float(metrics["loss"]),
                           lr=float(sched(it)), step_time_s=timer.mean())
              if (it + 1) % c.save_iters_segsr == 0:
                  if val_subjects:
                      val_dice = 0.0
                      if self._mh.is_primary():
                          seg_p = (state.params["seg"]
                                   if c.enable_distillation else state.params)
                          if self.seg_mesh is not None:
                              # eval is primary-only host work; the
                              # localized copy keeps the eval jits
                              # collective-free (and single-device on a
                              # spatial mesh), and the dice broadcasts so
                              # the COLLECTIVE best-tag orbax save below
                              # runs on every process in lockstep
                              seg_p = self._mh.localize(seg_p)
                          # the reference evaluates with the ENLARGED patch
                          # (x+64, y+64, z) reversed (train_all.py:563,165)
                          val_dice = evaluate(
                              seg, seg_p, patch_ori[::-1], c.data_path,
                              c.data_path.replace("imagesTr", "labelsTr"),
                              val_subjects, c.slice_separation,
                              mirror=self.eval_mirror)
                          print(f"Eval result: {val_dice}")
                          mlog.log(it + 1, val_dice=float(val_dice))
                      val_dice = self._mh.broadcast_scalar(val_dice)
                      if val_dice > best_dice:
                          # keep a best-by-val-dice checkpoint — the
                          # reference INTENDS this (train_all.py:566-573)
                          # but its save crashes (quirk Q1); tag dirs don't
                          # affect resume
                          ckpt.save_checkpoint(self.segsr_ckpt, state,
                                               step="best")
                      best_dice = max(best_dice, val_dice)
                  ckpt.save_checkpoint(self.segsr_ckpt, state)
            # pod-agreed final check: a SIGTERM during the last (up to) 9
            # steps must still checkpoint-and-stop (collective checks above
            # only run every 10 steps in multi-host mode)
            stop = guard.should_stop
            if self.dp_mesh is not None:
                stop = self._mh.any_flag(stop)
            if stop:
                ckpt.save_checkpoint(self.segsr_ckpt, state)
                raise TrainingPreempted(int(state.step))
        finally:
            if prof_on:  # loop ended (or raised) inside the trace window
                jax.profiler.stop_trace()
            # close on ANY exit (step_fn/evaluate/checkpoint errors included)
            # so the prefetch worker thread never leaks
            loader.close()
        ckpt.save_checkpoint(self.segsr_ckpt, state, step=total_steps)
        return seg, state, best_dice

    # ------------------------------------------------ stage 2, all folds

    def _fold_splits(self, n_folds=None):
        """Per-fold train/val subject lists: nnUNet splits_final.json when
        seg_path is configured, else synthetic round-robin K-fold."""
        c = self.cfg
        if c.seg_path:
            splits = load_splits(c.seg_path)
            if n_folds:
                splits = splits[:n_folds]
            return [(sp["train"], sp["val"]) for sp in splits]
        subjects = [s.replace("_0000.nii.gz", "").replace(".nii.gz", "")
                    for s in sorted(os.listdir(c.data_path))]
        k = int(n_folds or (c.extra or {}).get("synthetic_folds", 2))
        out = []
        for f in range(k):
            val = subjects[f::k]
            out.append(([s for s in subjects if s not in val], val))
        return out

    def stage2_segsr_all_folds(self, flavr_model=None, flavr_params=None,
                               n_folds=None):
        """Train ALL K folds' stage-2 models simultaneously, one fold per
        device (BASELINE.json config #5 — the reference trains folds as
        sequential single-GPU runs, train_all.py:577-583).

        Fold-parallelism via shard_map over a 1-D 'fold' mesh
        (parallel.fold_parallel): per-fold params/opt-state/batches carry a
        leading fold axis; there is zero cross-fold communication. Stage 1
        runs once, shared by all folds — self-SR is label-free per-subject
        training, but note the shared SR model sees every fold's training
        volumes (incl. labels as interpolation channels); for strict
        per-fold CV hygiene run folds individually like the reference.

        Requires n_devices >= K. Per-fold checkpoints land in
        <checkpoint_path>/segsr_fold{k}; per-fold eval uses each fold's own
        val split.
        """
        from .parallel.fold_parallel import (
            make_fold_mesh, stack_fold_states, unstack_fold_state,
            make_fold_parallel_step, place_fold_state, place_fold_batch)

        if jax.process_count() > 1:
            raise NotImplementedError(
                "--fold all is single-host (one fold per local device); on "
                "a pod run one fold per host instead: REHRSEG-style "
                "`--fold k` with per-host configs, or a single-host slice")

        c = self.cfg
        sep = int(c.slice_separation)
        arch, patch_size_zyx, patch_xyz, patch_ori = self._seg_arch_and_patches()
        folds = self._fold_splits(n_folds)
        K = len(folds)
        mesh = make_fold_mesh(K)

        seg = SegModel(num_classes=2, upscale=sep, input_channels=1, arch=arch)
        dist = None
        if c.enable_distillation:
            dist, _ = self._make_distiller(arch)
            flavr_model, flavr_params = self._ensure_flavr_teacher(
                flavr_model, flavr_params)

        datasets, loaders, ckpt_dirs = [], [], []
        device_augment = bool((c.extra or {}).get("device_augment", True))
        for k, (train_sub, _) in enumerate(folds):
            ds = SegSRDataset(self.segsr_h5_path, train_sub,
                              c.slice_thickness, c.target_thickness,
                              patch_ori, patch_xyz, c.random_flip,
                              c.enable_uncertainty,
                              device_augment=device_augment, seed=k)
            datasets.append(ds)
            loaders.append(BatchLoader(ds, c.batch_size_segsr, seed=k))
            ckpt_dirs.append(self.segsr_ckpt + f"_fold{k}")

        iters_per_epoch = max(min(len(d) for d in datasets)
                              // c.batch_size_segsr, 1)
        sched = poly_epoch_schedule(c.lr_segsr, c.epochs, iters_per_epoch)
        if c.enable_distillation:
            tx = nesterov_sgd(sched)
        else:
            from .train.optim import nesterov_sgd_grouped
            tx = nesterov_sgd_grouped(c.lr_segsr, sched)

        states = []
        for k in range(K):
            seg_params = self._init_seg_params(seg, arch, patch_size_zyx, k)
            params = seg_params
            if c.enable_distillation:
                _, dparams = self._make_distiller(arch)
                params = {"seg": seg_params, "distiller": dparams}
            st = TrainState.create(params, tx)
            if ckpt.has_checkpoint(ckpt_dirs[k]):
                st = ckpt.restore_checkpoint(ckpt_dirs[k], st)
            states.append(st)

        stacked = place_fold_state(stack_fold_states(states), mesh)
        if c.enable_distillation:
            fparams_k = jax.tree.map(
                lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                           (K,) + jnp.asarray(x).shape),
                flavr_params)
            fparams_k = place_fold_batch(fparams_k, mesh)
        else:
            # the step only reads the teacher under distillation; skip
            # materializing K FLAVR copies in HBM (None passes through
            # shard_map as an empty pytree)
            fparams_k = None

        base_step = make_seg_train_step(
            seg, tx, enable_uncertainty=c.enable_uncertainty,
            enable_distillation=c.enable_distillation,
            flavr_model=flavr_model, distiller=dist,
            teacher_window_chunk=(c.extra or {}).get("teacher_window_chunk"),
            # fold-parallel wraps the step in shard_map; the AOT memory
            # probe doesn't see through that, so 'auto' resolves to the
            # guaranteed-fit mode here (set an explicit extra.remat to
            # override)
            remat=(True if self._remat_mode() == "auto"
                   else self._remat_mode()), donate=False,
            precision=self.precision, sr_head_form=self._sr_head_form())
        fold_step = make_fold_parallel_step(base_step, mesh)

        aug_fn = None
        if device_augment:
            from .data.device_aug import augment_seg_batch
            patch_hw = (patch_xyz[1], patch_xyz[0])
            aug_fn = jax.jit(lambda kk, a, b, cc, d: augment_seg_batch(
                kk, a, b, cc, d, patch_hw=patch_hw,
                enable_uncertainty=c.enable_uncertainty))
        aug_key = jax.random.key(0)

        total_steps = c.epochs * iters_per_epoch
        # per-fold checkpoints are written together, so unequal restored
        # steps mean a torn save (crash mid-save-loop) or external edits:
        # resume from max — the behind folds lose at most one save interval
        # of steps, vs min-resume silently re-running steps on the ahead
        # folds and desynchronizing their counters/schedules from
        # total_steps
        fold_steps = [int(st.step) for st in states]
        if len(set(fold_steps)) > 1:
            print(f"WARNING: unequal fold checkpoint steps {fold_steps}; "
                  "resuming from max")
        start = max(fold_steps)
        mlog = MetricsLogger(self.segsr_ckpt + "_folds")
        # resume keeps each fold's best-by-val-dice watermark (see the
        # single-fold loop for the rationale)
        best = [mlog.max_on_disk(f"val_dice_fold{k}") for k in range(K)]

        def save_all(tag=None):
            for k, st in enumerate(unstack_fold_state(stacked, K)):
                ckpt.save_checkpoint(ckpt_dirs[k], st, step=tag)

        print(f"TRAINING NETWORK REHRSeg x{K} folds ({total_steps} steps, "
              f"mesh={dict(mesh.shape)})")
        guard = PreemptionGuard()
        try:
          with guard:
            for it in range(start, total_steps):
              if guard.should_stop:
                  save_all()
                  raise TrainingPreempted(
                      int(np.max(np.asarray(stacked.step))))
              fold_batches = []
              for k in range(K):
                  b = loaders[k].next()
                  if aug_fn is not None:
                      aug_key, sub = jax.random.split(aug_key)
                      img_a, llr_a, lhr_a, unc_a = aug_fn(
                          sub, jnp.asarray(b["img"]),
                          jnp.asarray(b["label_lr"]),
                          jnp.asarray(b["label_hr"]),
                          jnp.asarray(b["uncertainty_lr"]))
                      fold_batches.append(
                          SegBatch(img_a, llr_a, lhr_a, unc_a))
                  else:
                      fold_batches.append(SegBatch(
                          jnp.asarray(b["img"]), jnp.asarray(b["label_lr"]),
                          jnp.asarray(b["label_hr"]),
                          jnp.asarray(b["uncertainty_lr"])))
              batch = place_fold_batch(
                  jax.tree.map(lambda *xs: jnp.stack(xs), *fold_batches),
                  mesh)
              stacked, metrics = fold_step(stacked, fparams_k, batch)
              if (it + 1) % 100 == 0 or it + 1 == total_steps:
                  losses = np.asarray(metrics["loss"]).reshape(-1)
                  mlog.log(it + 1, **{f"loss_fold{k}": float(losses[k])
                                      for k in range(K)})
              if (it + 1) % c.save_iters_segsr == 0 or it + 1 == total_steps:
                  per_fold = unstack_fold_state(stacked, K)
                  for k, st in enumerate(per_fold):
                      seg_p = (st.params["seg"] if c.enable_distillation
                               else st.params)
                      val_sub = folds[k][1]
                      if val_sub:
                          val_dice = evaluate(
                              seg, seg_p, patch_ori[::-1], c.data_path,
                              c.data_path.replace("imagesTr", "labelsTr"),
                              val_sub, c.slice_separation,
                              mirror=self.eval_mirror)
                          print(f"Eval fold {k}: {val_dice}")
                          mlog.log(it + 1, **{f"val_dice_fold{k}":
                                              float(val_dice)})
                          if val_dice > best[k]:
                              ckpt.save_checkpoint(ckpt_dirs[k], st,
                                                   step="best")
                              best[k] = val_dice
                      ckpt.save_checkpoint(ckpt_dirs[k], st,
                                           step=(total_steps
                                                 if it + 1 == total_steps
                                                 else None))
        finally:
            for ld in loaders:
                if hasattr(ld, "close"):
                    ld.close()
        return seg, unstack_fold_state(stacked, K), best

    # ------------------------------------------------------------ run all

    def run(self):
        print("=" * 20, "PROCESSING DATA", "=" * 20)
        self.preprocess()
        print("=" * 20, "BEGIN TRAINING STAGE ONE", "=" * 20)
        self.stage1a_smore()
        flavr_model, flavr_state = self.stage1b_flavr()
        unc_model, unc_state = self.stage1c_uncertainty()
        self.postprocess_flavr()
        model = unc_model if unc_model is not None else flavr_model
        mstate = unc_state if unc_state is not None else flavr_state
        if self.cfg.fold == "all":
            return self.stage2_segsr_all_folds(
                model, mstate.params if mstate else None)
        return self.stage2_segsr(model, mstate.params if mstate else None)


def main(config_path: str, fold: int | str | None = None, **overrides):
    from .config import load_config
    cfg = load_config(config_path, fold=fold, **overrides)
    if not Path(cfg.data_path).exists():
        raise ValueError("Input image path does not exist.")
    if cfg.seg_path and not Path(cfg.seg_path).exists():
        raise ValueError("Segmentation results from nnUNet does not exist.")
    return Pipeline(cfg).run()
