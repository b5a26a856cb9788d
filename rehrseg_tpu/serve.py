"""Production serving API: NIfTI in -> segmentation NIfTI out.

A thin deployment layer over the sliding-window engine: load trained
SegModel weights once, then segment volumes (optionally many, pipelined so
host<->device transfers overlap compute). Matches the reference evaluation
semantics (zscore -> pad -> gaussian sliding window + mirror TTA -> argmax,
train_all.py:154-193) but packaged for serving rather than research loops.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .io import nifti
from .models import SegModel
from .utils.pad import target_pad, crop
from .data.normalize import zscore_normalization
from .infer.sliding_window import (
    predict_sliding_window_labels, predict_sliding_window_dual_labels,
    predict_sliding_window_labels_streamed,
    predict_sliding_window_dual_labels_streamed,
    _run_sliding_window, _argmax_uint8,
)


@dataclass
class Segmenter:
    """Stateless-per-request volume segmenter.

    params: SegModel flax params (e.g. from train.checkpoint.restore or
    torch_import). patch_size: (z, y, x) network patch. compute_dtype:
    bf16 by default (params are cast once at construction).
    """

    model: SegModel
    params: dict
    patch_size: tuple
    slice_separation: int = 4
    mirror: bool = True
    tile_step_size: float = 0.5
    packed_eval: bool = True
    # "parity" = the reference-bit-identical tile grid; "aligned" = starts
    # snapped to (H % 8, W % 128) + the fused Pallas accumulate kernel —
    # measured +6% device throughput, same tile count/overlap structure
    # (infer/sliding_window.py aligned section). Requires packed_eval and
    # 8-way mirror; incompatible with streaming/mesh.
    tile_grid: str = "parity"
    # jax.sharding.Mesh: 'data' shards TTA, 'spatial' halo-shards tile H
    # across chips (LR path; see infer.sliding_window)
    mesh: object = None
    # streaming: None = whole-volume accumulators on device; an int = z-slab
    # streaming with that many tile-rows per slab (for volumes whose
    # accumulators exceed HBM; exact same result, LR and HR paths both)
    streaming: int | None = None
    num_classes: int = 2
    compute_dtype: object = jnp.bfloat16

    def __post_init__(self):
        if self.mesh is not None and self.streaming:
            raise ValueError(
                "streaming z-slabs and mesh sharding are separate >HBM "
                "strategies and do not compose yet — pick one (a streamed "
                "slab would silently run on a single chip)")
        if self.tile_grid not in ("parity", "aligned"):
            raise ValueError(f"tile_grid must be 'parity' or 'aligned', "
                             f"got {self.tile_grid!r}")
        if self.tile_grid == "aligned" and (
                not self.packed_eval or not self.mirror
                or self.streaming or self.mesh is not None):
            raise ValueError(
                "tile_grid='aligned' requires packed_eval + mirror TTA and "
                "does not compose with streaming or mesh sharding")
        self.params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=self.compute_dtype), self.params)
        model = self.model

        if self.packed_eval:
            # space-to-depth packed forward: mathematically identical,
            # measured 1.5-1.6x on chip (models/segnet_packed.py); falls
            # back per-stage on odd spatial dims so it is always safe
            from .models.segnet_packed import segmodel_apply_packed
            arch = dict(model.arch)

            def _packed_fn(dual: bool, plane_out: bool):
                # one factory for all four packed-eval closures (LR/dual x
                # channel-last/plane-out) so the aligned path can never
                # drift out of sync with the parity path
                def fn(p, batch):
                    # pallas_conv="cat" fuses the decoder skip concat into
                    # a Pallas kernel (eval-only: the kernel has no VJP);
                    # measured +3.2% LR / +2.4% dual engine-level with
                    # per-class fallbacks, exactness-pinned
                    # (docs/BENCHMARKS.md round-5 cat section)
                    kw = dict(pack_max_channels=64, plane_out=plane_out,
                              pallas_conv="cat")
                    if dual:
                        kw.update(dual=True, upscale=model.upscale)
                    return segmodel_apply_packed(
                        arch, p, batch.astype(self.compute_dtype), **kw)
                return fn

            lr_fn = _packed_fn(False, False)
            dual_fn = _packed_fn(True, False)
        else:
            def lr_fn(p, batch):
                return model.apply(p, batch.astype(self.compute_dtype))[0]

            def dual_fn(p, batch):
                return model.apply(p, batch.astype(self.compute_dtype))

        self._lr_fn = lr_fn
        self._dual_fn = dual_fn

        if self.tile_grid == "aligned":
            self._lr_fn_planes = _packed_fn(False, True)
            self._dual_fn_planes = _packed_fn(True, True)

    # ------------------------------------------------------------- core

    def _prep(self, volume_zyx: np.ndarray):
        vol = zscore_normalization(volume_zyx.astype(np.float32))[..., None]
        target_shape = [max(s, p) for s, p in zip(vol.shape[:3],
                                                  self.patch_size)]
        return target_pad(vol, target_shape + [1], mode="constant")

    def _aligned_ok(self, shape) -> bool:
        """The aligned grid refuses volumes where snapping cannot cover
        every voxel (patch narrower than an axis snap on a multi-tile
        axis — sliding_window.py coverage guard); such volumes serve the
        parity grid instead of erroring."""
        from .infer.sliding_window import aligned_sliding_window_starts
        try:
            aligned_sliding_window_starts(shape, self.patch_size,
                                          self.tile_step_size)
            return True
        except ValueError:
            return False

    def segment(self, volume_zyx: np.ndarray, hr: bool = False):
        """volume: (z, y, x). Returns LR uint8 mask, or (lr, hr) with hr."""
        vol_p, pads = self._prep(volume_zyx)
        if self.tile_grid == "aligned" and self._aligned_ok(vol_p.shape[:3]):
            from .infer.sliding_window import (
                predict_sliding_window_labels_aligned,
                predict_sliding_window_dual_labels_aligned)
            if hr:
                lr_full, hr_full = predict_sliding_window_dual_labels_aligned(
                    self._dual_fn_planes, self.params, vol_p,
                    self.patch_size,
                    slice_separation=self.slice_separation,
                    tile_step_size=self.tile_step_size,
                    num_classes=self.num_classes)
                sep = self.slice_separation
                hr_pads = ((pads[0][0] * sep, pads[0][1] * sep),) + pads[1:3]
                return crop(lr_full, pads[:3]), crop(hr_full, hr_pads)
            pred = predict_sliding_window_labels_aligned(
                self._lr_fn_planes, self.params, vol_p, self.patch_size,
                tile_step_size=self.tile_step_size,
                num_classes=self.num_classes)
            return crop(pred, pads[:3])
        if hr:
            if self.streaming:
                lr_full, hr_full = predict_sliding_window_dual_labels_streamed(
                    self._dual_fn, self.params, vol_p, self.patch_size,
                    slice_separation=self.slice_separation,
                    z_slab_tiles=int(self.streaming),
                    tile_step_size=self.tile_step_size, mirror=self.mirror,
                    num_classes=self.num_classes)
            else:
                lr_full, hr_full = predict_sliding_window_dual_labels(
                    self._dual_fn, self.params, vol_p, self.patch_size,
                    slice_separation=self.slice_separation,
                    tile_step_size=self.tile_step_size, mirror=self.mirror,
                    num_classes=self.num_classes)
            sep = self.slice_separation
            hr_pads = ((pads[0][0] * sep, pads[0][1] * sep),) + pads[1:3]
            return crop(lr_full, pads[:3]), crop(hr_full, hr_pads)
        if self.streaming:
            pred = predict_sliding_window_labels_streamed(
                self._lr_fn, self.params, vol_p, self.patch_size,
                z_slab_tiles=int(self.streaming),
                tile_step_size=self.tile_step_size, mirror=self.mirror,
                num_classes=self.num_classes)
        else:
            pred = predict_sliding_window_labels(
                self._lr_fn, self.params, vol_p, self.patch_size,
                slice_separation=1, tile_step_size=self.tile_step_size,
                mirror=self.mirror, num_classes=self.num_classes,
                tta_mesh=self.mesh)
        return crop(pred, pads[:3])

    def segment_many(self, volumes_zyx):
        """Pipelined batch segmentation: all scans dispatch before any label
        map downloads, hiding tunnel transfers under device compute.
        Honors tile_grid='aligned' (the batch path serves the same engine
        as segment() — they must not diverge). Streaming/mesh configs fall
        back to sequential segment() calls: those engines manage their own
        device memory/collectives and must not be whole-volume-batched."""
        if self.streaming or self.mesh is not None:
            return [self.segment(v) for v in volumes_zyx]
        prepped = [self._prep(v) for v in volumes_zyx]
        if (self.tile_grid == "aligned"
                and all(self._aligned_ok(vol_p.shape[:3])
                        for vol_p, _ in prepped)):
            from .infer.sliding_window import (
                predict_sliding_window_labels_aligned_many)
            preds = predict_sliding_window_labels_aligned_many(
                self._lr_fn_planes, self.params,
                [vol_p for vol_p, _ in prepped], self.patch_size,
                tile_step_size=self.tile_step_size,
                num_classes=self.num_classes)
            return [crop(p, pads[:3])
                    for p, (_, pads) in zip(preds, prepped)]
        if self.tile_grid == "aligned":
            # mixed coverage: stay engine-consistent per volume
            return [self.segment(v) for v in volumes_zyx]
        pending = []
        for vol_p, _ in prepped:
            logits, _ = _run_sliding_window(
                self._lr_fn, self.params, vol_p, self.patch_size, 1,
                self.tile_step_size, True, self.mirror, self.num_classes,
                need_weights=False)
            pending.append(_argmax_uint8(logits))
        return [crop(np.asarray(p), pads[:3])
                for p, (_, pads) in zip(pending, prepped)]

    # ------------------------------------------------------------- files

    def segment_file(self, in_path: str, out_path: str,
                     hr_out_path: str | None = None) -> None:
        """NIfTI in -> binarized segmentation NIfTI out, geometry copied from
        the input (train_all.py:166-181 semantics)."""
        ref = nifti.read_image_itk(in_path)
        if hr_out_path is not None:
            pred_lr, pred_hr = self.segment(ref.array.astype(np.float32),
                                            hr=True)
        else:
            pred_lr = self.segment(ref.array.astype(np.float32))
        nifti.write_image_itk(
            nifti.ItkLikeImage(pred_lr.astype(np.uint8), ref.spacing,
                               ref.origin, ref.direction), out_path)
        if hr_out_path is not None:
            sp = ref.spacing
            nifti.write_image_itk(
                nifti.ItkLikeImage(
                    pred_hr.astype(np.uint8),
                    (sp[0], sp[1], sp[2] / self.slice_separation),
                    ref.origin, ref.direction), hr_out_path)


def load_segmenter_from_checkpoint(ckpt_dir: str, arch: dict, patch_size,
                                   slice_separation: int = 4,
                                   num_classes: int = 2,
                                   step: int | str | None = None,
                                   **kw) -> Segmenter:
    """Restore a trained stage-2 checkpoint into a Segmenter.

    Uses a template-free restore so both plain and distillation-trained
    checkpoints (params = {'seg': ..., 'distiller': ...}) load.
    ``step``: a step number, the tag "best" (best-by-val-dice save), or None
    for the latest step.
    """
    from .train import checkpoint as ckpt

    model = SegModel(num_classes=num_classes, upscale=slice_separation,
                     arch=arch)
    restored = ckpt.restore_checkpoint_raw(ckpt_dir, step=step)
    p = restored["params"]
    if isinstance(p, dict) and "seg" in p:
        p = p["seg"]
    return Segmenter(model=model, params=p, patch_size=tuple(patch_size),
                     slice_separation=slice_separation,
                     num_classes=num_classes, **kw)


@dataclass
class SRVolumizer:
    """Stage-1 SR serving: merged 2-channel (image+label) NIfTI in ->
    pseudo-HR image/label (or uncertainty-map) NIfTIs out, the
    inference_flavr surface (reference sr_utils.py:137-242) as a
    deployable service rather than a pipeline step.

    compute_dtype: None = fp32 (reference parity); jnp.bfloat16 halves
    the device fetch at ~0.86 measured MFU (docs/BENCHMARKS.md).
    """

    model: object
    params: dict
    slice_thickness: float = 4.0
    target_thickness: float = 1.0
    batch: int = 8
    compute_dtype: object = None

    def sr_file(self, in_path: str, out_base: str,
                ref_path: str | None = None,
                uncertainty: bool = False) -> None:
        """in_path: merged 2-channel NIfTI. Writes ``<out_base>_img.nii.gz``
        + ``_seg.nii.gz`` (or ``_uncertainty.nii.gz``) at HR z-spacing with
        the geometry of ``ref_path`` (default: the input)."""
        from .io.volume import parse_image
        from .infer.sr_infer import infer_flavr_volume, restore_intensity

        from .io.volume import write_sr_niftis

        sep = self.slice_thickness / self.target_thickness
        image, _, _, _, _, _, orig_min, orig_max = parse_image(
            in_path, self.slice_thickness, self.target_thickness)
        ref = nifti.read_image_itk(ref_path or in_path)
        out = infer_flavr_volume(
            self.model, self.params, image.astype(np.float32), sep,
            out_index=1 if uncertainty else 0, batch=self.batch,
            compute_dtype=self.compute_dtype)
        out = restore_intensity(out, orig_min, orig_max)
        if uncertainty:
            write_sr_niftis(ref, out_base, sep, unc_xyz=out[..., 0])
        else:
            write_sr_niftis(ref, out_base, sep, img_xyz=out[..., 0],
                            seg_xyz=out[..., 1])


def load_sr_from_checkpoint(ckpt_dir: str, *, num_slices: int = 4,
                            slice_separation: int = 4,
                            uncertainty: bool = False,
                            img_channels: int = 2,
                            slice_thickness: float = 4.0,
                            target_thickness: float = 1.0,
                            step: int | str | None = None,
                            **kw) -> SRVolumizer:
    """Restore a stage-1b (flavr) or stage-1c (flavr_uncertainty)
    checkpoint into an SRVolumizer."""
    from .models import UNet3D
    from .train import checkpoint as ckpt

    model = UNet3D(img_channels=img_channels, n_inputs=num_slices,
                   n_outputs=int(slice_separation),
                   use_uncertainty=uncertainty)
    restored = ckpt.restore_checkpoint_raw(ckpt_dir, step=step)
    return SRVolumizer(model=model, params=restored["params"],
                       slice_thickness=slice_thickness,
                       target_thickness=target_thickness, **kw)


def main():
    """CLI serving: ``python -m rehrseg_tpu.serve --ckpt ckpt/segsr
    --config configs/brain.yaml IN.nii.gz OUT.nii.gz [--hr HR.nii.gz]``;
    ``--mode sr`` serves stage-1 SR volumes from a flavr checkpoint
    (``--ckpt ckpt/flavr``, outputs ``<out>_img/_seg`` or
    ``--sr-uncertainty`` for the UASR map)."""
    import argparse

    parser = argparse.ArgumentParser(
        description="REHRSeg-TPU volume segmentation serving")
    parser.add_argument("inputs", nargs="+",
                        help="input NIfTI(s); with --out-dir, many at once")
    parser.add_argument("--ckpt", required=True,
                        help="stage-2 checkpoint dir (orbax)")
    parser.add_argument("--config", required=True,
                        help="pipeline YAML (for arch/patch/separation)")
    parser.add_argument("--step", default=None,
                        help="checkpoint step number or 'best'")
    parser.add_argument("--out", default=None, help="output path (1 input)")
    parser.add_argument("--hr", default=None, help="HR output path")
    parser.add_argument("--out-dir", default=None,
                        help="output directory for many inputs")
    parser.add_argument("--no-mirror", action="store_true",
                        help="disable 8-way TTA")
    parser.add_argument("--mode", choices=("seg", "sr"), default="seg",
                        help="seg (default) or stage-1 SR volume serving")
    parser.add_argument("--sr-uncertainty", action="store_true",
                        help="sr mode: emit the UASR uncertainty map "
                             "(checkpoint must be the uncertainty model)")
    args = parser.parse_args()

    from .config import load_config
    from .pipeline import Pipeline
    from .utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.config)

    if args.mode == "sr":
        step = args.step
        if step is not None and step != "best":
            step = int(step)
        sr = load_sr_from_checkpoint(
            args.ckpt, num_slices=cfg.num_slices,
            slice_separation=int(cfg.slice_separation),
            uncertainty=args.sr_uncertainty,
            slice_thickness=cfg.slice_thickness,
            target_thickness=cfg.target_thickness, step=step)
        outs = []
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            for path in args.inputs:
                base = os.path.join(
                    args.out_dir,
                    os.path.basename(path).replace(".nii.gz", ""))
                sr.sr_file(path, base, uncertainty=args.sr_uncertainty)
                outs.append(base)
        else:
            assert len(args.inputs) == 1 and args.out, \
                "single input needs --out (or use --out-dir)"
            base = args.out.replace(".nii.gz", "")
            sr.sr_file(args.inputs[0], base,
                       uncertainty=args.sr_uncertainty)
            outs.append(base)
        for b in outs:
            print(f"SR -> {b}_*.nii.gz")
        return
    pipe = Pipeline.__new__(Pipeline)
    pipe.cfg = cfg
    pipe.arch_override = (cfg.extra or {}).get("arch_override")
    arch, patch_size_zyx, _, _ = Pipeline._seg_arch_and_patches(pipe)
    step = args.step
    if step is not None and step != "best":
        step = int(step)
    seg = load_segmenter_from_checkpoint(
        args.ckpt, arch, patch_size=patch_size_zyx,
        slice_separation=int(cfg.slice_separation), step=step,
        mirror=not args.no_mirror)

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        for path in args.inputs:
            base = os.path.basename(path).replace(".nii.gz", "_seg.nii.gz")
            hr_out = None
            if args.hr:
                # --hr with --out-dir: treat the flag as "also write HR",
                # one per input (a single --hr PATH can't name N outputs)
                hr_out = os.path.join(args.out_dir, base.replace(
                    "_seg.nii.gz", "_hr_seg.nii.gz"))
            seg.segment_file(path, os.path.join(args.out_dir, base),
                             hr_out_path=hr_out)
            print(f"{path} -> {os.path.join(args.out_dir, base)}"
                  + (f" + {hr_out}" if hr_out else ""))
    else:
        assert len(args.inputs) == 1 and args.out, \
            "single input needs --out (or use --out-dir)"
        seg.segment_file(args.inputs[0], args.out, hr_out_path=args.hr)
        print(f"{args.inputs[0]} -> {args.out}" +
              (f" + {args.hr}" if args.hr else ""))


if __name__ == "__main__":
    main()
