"""Loader-INCLUSIVE training throughput (VERDICT r4 item #4): does the
single-thread host input pipeline keep the chip fed at production step
rates?

Every stage-1/stage-2 step-time number in docs/BENCHMARKS.md feeds
pre-built device batches; the 5.8 h/chip stage-1 projection silently
assumes the loader never starves an ~80 ms/step chip at batch 32
(~400 samples/s). This harness measures

  A. pure host prep rate (samples/s) through PrefetchLoader for the
     stage-1 dataset in its config variants (host LR-sim vs device LR-sim
     vs host nnunet transforms);
  B. loader-inclusive stage-1 step time (the real loop body: loader.next
     -> device-sim -> train step, async dispatch) vs the device-only step;
  C. the same for stage 2 (SegSRDataset, device_augment default).

Synthetic but reference-geometry data: stage-1 merged 2-channel NIfTIs at
(455, 633, 20); stage-2 pseudo-HR h5 at (455, 633, 80).
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.io import nifti
from rehrseg_tpu.io.volume import write_h5
from rehrseg_tpu.data.datasets import (SRPatchDataset, SegSRDataset,
                                       BatchLoader, PrefetchLoader)
from rehrseg_tpu.models import UNet3D, SegModel, DEFAULT_ARCH
from rehrseg_tpu.train import (TrainState, onecycle_adam, nesterov_sgd,
                               make_sr_train_step, make_seg_train_step,
                               SegBatch)
from rehrseg_tpu.train.optim import poly_epoch_schedule

ROOT = "/tmp/loader_bench_data"
N_SUBJ = 2
VOL = (455, 633, 20)          # (x, y, thin-z), reference example geometry
B1, B2 = 32, 2
STAGE1_PATCH = (16, 96, 96)   # calc_out_patch_size of (4, 96, 96) at x4


def make_data():
    merged = os.path.join(ROOT, "merged")
    segsr = os.path.join(ROOT, "segsr_h5")
    if os.path.isdir(merged) and os.path.isdir(segsr):
        return merged, segsr
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(merged)
    os.makedirs(segsr)
    rng = np.random.default_rng(0)
    for i in range(N_SUBJ):
        img = rng.normal(size=VOL).astype(np.float32)
        lab = (rng.normal(size=VOL) > 1.5).astype(np.float32)
        merged_vol = np.stack([img, lab], axis=-1)
        aff = np.diag([1.0, 1.0, 4.0, 1.0])
        nd = merged_vol.ndim
        header = nifti.NiftiHeader(
            dim=(nd, *merged_vol.shape, *([1] * (7 - nd))),
            pixdim=(1.0, 1.0, 1.0, 4.0, 1.0, 1.0, 1.0, 1.0),
            dtype=merged_vol.dtype, affine=aff)
        nifti.save(nifti.NiftiImage(data=merged_vol, affine=aff,
                                    header=header),
                   os.path.join(merged, f"sub{i}_0000.nii.gz"))
        hr = (VOL[0], VOL[1], VOL[2] * 4)
        write_h5(os.path.join(segsr, f"sub{i}_0000.h5"),
                 img=rng.normal(size=hr).astype(np.float32),
                 seg=(rng.normal(size=hr) > 1.5).astype(np.uint8),
                 uncertainty=rng.integers(0, 255, size=hr).astype(np.uint8))
    return merged, segsr


def host_rate(name, loader, batch, n=8):
    # direct (threadless) BatchLoader timing: deterministic on the 1-core
    # host, where a prefetch thread only adds scheduling noise
    loader.next()
    t0 = time.perf_counter()
    for _ in range(n):
        loader.next()
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {batch / dt:7.1f} samples/s host prep "
          f"({dt * 1e3:.0f} ms/batch-{batch})", flush=True)
    if hasattr(loader, "close"):
        loader.close()
    return batch / dt


def main():
    merged, segsr = make_data()
    subs = [f"sub{i}" for i in range(N_SUBJ)]

    # ---------------- A: stage-1 host prep variants
    variants = [
        ("stage1 host-sim (B-spline resize on host)",
         dict(device_lr_sim=False, nnunet_transform=False)),
        ("stage1 host-sim + host nnunet transforms",
         dict(device_lr_sim=False, nnunet_transform=True)),
        ("stage1 device-sim (host does crop/flip only)",
         dict(device_lr_sim=True, nnunet_transform=False)),
    ]
    rates = {}
    for name, kw in variants:
        ds = SRPatchDataset(merged, subs, 4.0, 1.0, None, "rf-pulse-slr",
                            STAGE1_PATCH, True, blur=True, **kw)
        rates[name] = host_rate(name, BatchLoader(ds, B1), B1)

    # ---------------- B: loader-inclusive stage-1 step (device-sim path)
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    ds = SRPatchDataset(merged, subs, 4.0, 1.0, None, "rf-pulse-slr",
                        STAGE1_PATCH, True, blur=True, device_lr_sim=True)
    loader = PrefetchLoader(BatchLoader(ds, B1))
    lr0, hr0 = loader.next()
    # device_lr_sim batches carry the pre-resize LR SOURCE; the model
    # consumes the 4-slice LR window it produces
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 4, 96, 96, 2)))
    tx, _ = onecycle_adam(5e-4, 1000)
    step = make_sr_train_step(model, tx, enable_uncertainty=True,
                              slice_separation=4, num_slices=4,
                              donate=True, precision="bf16")
    state = TrainState.create(params, tx)
    from rehrseg_tpu.data.device_sr_sim import simulate_lr_batch
    key = jax.random.key(7)

    def one(state, key, lr_b, hr_b):
        key, sub = jax.random.split(key)
        lr_d = simulate_lr_batch(sub, jnp.asarray(lr_b), 4.0)
        state, m = step(state, lr_d, jnp.asarray(hr_b))
        return state, key, m

    state, key, m = one(state, key, lr0, hr0)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        lr_b, hr_b = loader.next()
        state, key, m = one(state, key, lr_b, hr_b)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    loader.close()
    print(f"stage-1 loader-INCLUSIVE step (device-sim): {dt * 1e3:6.1f} "
          f"ms/step (device-only best: ~80 ms, docs/BENCHMARKS.md)",
          flush=True)

    # ---------------- C: stage-2
    arch = dict(DEFAULT_ARCH)
    patch_xyz = [256, 320, 16]
    patch_ori = [patch_xyz[0] + 64, patch_xyz[1] + 64, patch_xyz[2]]
    ds2 = SegSRDataset(segsr, subs, 4.0, 1.0, patch_ori, patch_xyz, True,
                       True, device_augment=True)
    rates["stage2 host prep (crop/flip, device-augment default)"] = \
        host_rate("stage2 host prep (crop/flip, device-augment default)",
                  BatchLoader(ds2, B2), B2)

    seg = SegModel(num_classes=2, upscale=4, arch=arch)
    ds2 = SegSRDataset(segsr, subs, 4.0, 1.0, patch_ori, patch_xyz, True,
                       True, device_augment=True)
    loader2 = PrefetchLoader(BatchLoader(ds2, B2))
    b = loader2.next()
    seg_params = jax.jit(seg.init)(jax.random.key(0),
                                   jnp.asarray(b["img"][:1]))
    tx2 = nesterov_sgd(poly_epoch_schedule(1e-2, 10, 5))
    step2 = make_seg_train_step(seg, tx2, enable_uncertainty=True,
                                enable_distillation=False,
                                precision="bf16")
    state2 = TrainState.create(seg_params, tx2)
    from rehrseg_tpu.data.device_aug import augment_seg_batch
    patch_hw = (patch_xyz[1], patch_xyz[0])
    aug = jax.jit(lambda k, a, bb, c, d: augment_seg_batch(
        k, a, bb, c, d, patch_hw=patch_hw, enable_uncertainty=True))
    key = jax.random.key(9)

    def one2(state2, key, bb):
        key, sub = jax.random.split(key)
        img, llr, lhr, unc = aug(sub, jnp.asarray(bb["img"]),
                                 jnp.asarray(bb["label_lr"]),
                                 jnp.asarray(bb["label_hr"]),
                                 jnp.asarray(bb["uncertainty_lr"]))
        state2, m = step2(state2, None, SegBatch(img, llr, lhr, unc))
        return state2, key, m

    state2, key, m = one2(state2, key, b)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        bb = loader2.next()
        state2, key, m = one2(state2, key, bb)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    loader2.close()
    print(f"stage-2 loader-INCLUSIVE step (device-aug): {dt * 1e3:6.1f} "
          f"ms/step (device-only best: ~544 ms, docs/BENCHMARKS.md)",
          flush=True)


if __name__ == "__main__":
    main()
