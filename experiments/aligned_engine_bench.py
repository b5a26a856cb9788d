"""Full-engine A/B at bench geometry on the real TPU: parity grid + XLA
tail vs aligned grid + fused Pallas accumulate kernel (VERDICT r4 item #1
"Done" gate: >= +5% device-resident Mvox/s or a committed negative result).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.models import SegModel, DEFAULT_ARCH
from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed
from rehrseg_tpu.infer.sliding_window import (
    _sliding_window_scan, _sliding_window_scan_aligned, _device_gaussian,
    _device_starts, _argmax_uint8, aligned_sliding_window_starts,
    _sliding_window_scan_dual)
from rehrseg_tpu.utils.pad import target_pad

PATCH = (16, 320, 384)
VOLUME = (20, 455, 633)
SEP = 4

arch = dict(DEFAULT_ARCH)
model = SegModel(num_classes=2, upscale=SEP, arch=arch)
x0 = jnp.zeros((1, *PATCH, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), x0)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

rng = np.random.default_rng(0)
vol = rng.normal(size=VOLUME).astype(np.float32)[..., None]
target_shape = [max(s, p) for s, p in zip(vol.shape[:3], PATCH)] + [1]
vol_p, _ = target_pad(vol, target_shape, mode="constant")
voxels = int(np.prod(vol_p.shape[:3]))


def lr_fn(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64)


def lr_fn_planes(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 plane_out=True)


def lr_fn_pallas(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 pallas_conv=True)


def lr_fn_planes_pallas(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 plane_out=True, pallas_conv=True)


def lr_fn_planes_cat(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 plane_out=True, pallas_conv="cat")


def lr_fn_planes_fused(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 plane_out=True, pallas_conv="fused")


def dual_fn(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 dual=True, upscale=SEP)


def dual_fn_planes(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 dual=True, upscale=SEP, plane_out=True)


def dual_fn_planes_cat(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 dual=True, upscale=SEP, plane_out=True,
                                 pallas_conv="cat")


def dual_fn_planes_fused(p, b):
    return segmodel_apply_packed(arch, p, b, pack_max_channels=64,
                                 dual=True, upscale=SEP, plane_out=True,
                                 pallas_conv="fused")


def timed(name, fn, vox, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt * 1e3:7.0f} ms -> {vox / dt / 1e6:6.2f} Mvox/s")
    return dt


# ---------------- parity grid, XLA tail (today's production path)
g_dev = _device_gaussian(PATCH, True)
starts_par = _device_starts(tuple(vol_p.shape[:3]), PATCH, 0.5, 1)
dev_par = jnp.asarray(vol_p.astype(np.float32), jnp.bfloat16)
consume = jax.jit(lambda lab: lab.astype(jnp.int32).sum())


def run_parity():
    lg, _ = _sliding_window_scan(
        lr_fn, params, dev_par, starts_par, g_dev, PATCH,
        tuple(vol_p.shape[:3]), 1, True, 2, need_weights=False)
    return float(consume(_argmax_uint8(lg)))


# ---------------- aligned grid, fused Pallas tail
starts_al, padded = aligned_sliding_window_starts(vol_p.shape[:3], PATCH, 0.5)
volp_al = np.pad(vol_p, [(0, padded[i] - vol_p.shape[i])
                         for i in range(3)] + [(0, 0)])
dev_al = jnp.asarray(volp_al.astype(np.float32), jnp.bfloat16)
starts_al_d = jnp.asarray(starts_al)
consume0 = jax.jit(lambda l: jnp.argmax(l, 0).astype(jnp.int32).sum())


def run_aligned():
    lg = _sliding_window_scan_aligned(
        lr_fn_planes, params, dev_al, starts_al_d, g_dev, PATCH,
        tuple(volp_al.shape[:3]), 1, 2, False)
    return float(consume0(lg))


def run_parity_pallas():
    lg, _ = _sliding_window_scan(
        lr_fn_pallas, params, dev_par, starts_par, g_dev, PATCH,
        tuple(vol_p.shape[:3]), 1, True, 2, need_weights=False)
    return float(consume(_argmax_uint8(lg)))


def run_aligned_pallas():
    lg = _sliding_window_scan_aligned(
        lr_fn_planes_pallas, params, dev_al, starts_al_d, g_dev, PATCH,
        tuple(volp_al.shape[:3]), 1, 2, False)
    return float(consume0(lg))


def run_aligned_cat():
    lg = _sliding_window_scan_aligned(
        lr_fn_planes_cat, params, dev_al, starts_al_d, g_dev, PATCH,
        tuple(volp_al.shape[:3]), 1, 2, False)
    return float(consume0(lg))


# ---------------- dual engines
g_hr = _device_gaussian((PATCH[0] * SEP,) + PATCH[1:], True)
consume2 = jax.jit(lambda a, b: a.astype(jnp.int32).sum()
                   + b.astype(jnp.int32).sum())


def run_dual_parity():
    llr, _, lhr, _ = _sliding_window_scan_dual(
        dual_fn, params, dev_par, starts_par, g_dev, g_hr, PATCH,
        tuple(vol_p.shape[:3]), SEP, True, 2, need_weights=False)
    return float(consume2(_argmax_uint8(llr), _argmax_uint8(lhr)))


from functools import partial
from rehrseg_tpu.ops.pallas_tail import accumulate_tta_tile
from rehrseg_tpu.infer.sliding_window import _mirror_batch_zgrouped


@partial(jax.jit, static_argnames=("fn",))
def _dual_aligned(dev_data, starts_d, fn=dual_fn_planes):
    shape = tuple(dev_data.shape[:3])
    llr0 = jnp.zeros((2, *shape), jnp.float32)
    lhr0 = jnp.zeros((2, shape[0] * SEP, shape[1], shape[2]), jnp.float32)
    pd, ph, pw = PATCH

    def tile_step(carry, start):
        llr, lhr = carry
        tile = jax.lax.dynamic_slice(
            dev_data, (start[0], start[1], start[2], 0),
            (pd, ph, pw, dev_data.shape[-1]))
        batch = _mirror_batch_zgrouped(tile)
        p_lr, p_hr = fn(params, batch)
        llr = accumulate_tta_tile(llr, p_lr, g_dev, start, z_scale=1)
        lhr = accumulate_tta_tile(lhr, p_hr, g_hr, start, z_scale=SEP)
        return (llr, lhr), None

    (llr, lhr), _ = jax.lax.scan(tile_step, (llr0, lhr0), starts_d)
    return (jnp.argmax(llr, 0).astype(jnp.uint8),
            jnp.argmax(lhr, 0).astype(jnp.uint8))


def run_dual_aligned():
    a, b = _dual_aligned(dev_al, starts_al_d)
    return float(consume2(a, b))


def run_dual_aligned_cat():
    a, b = _dual_aligned(dev_al, starts_al_d, fn=dual_fn_planes_cat)
    return float(consume2(a, b))


def run_aligned_fused():
    lg = _sliding_window_scan_aligned(
        lr_fn_planes_fused, params, dev_al, starts_al_d, g_dev, PATCH,
        tuple(volp_al.shape[:3]), 1, 2, False)
    return float(consume0(lg))


def run_dual_aligned_fused():
    a, b = _dual_aligned(dev_al, starts_al_d, fn=dual_fn_planes_fused)
    return float(consume2(a, b))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    vox_dual = voxels * (1 + SEP)
    if which == "cat":
        # round-5 concat-fusion A/B: XLA engines vs pallas_conv="cat"
        t_al = timed("aligned grid + Pallas    ", run_aligned, voxels)
        t_ac = timed("aligned + cat kernel     ", run_aligned_cat, voxels)
        print(f"cat-conv LR speedup: {t_al / t_ac:.3f}x")
        t_da = timed("dual aligned + Pallas    ", run_dual_aligned, vox_dual)
        t_dc = timed("dual aligned + cat       ", run_dual_aligned_cat,
                     vox_dual)
        print(f"cat-conv dual speedup: {t_da / t_dc:.3f}x")
        sys.exit(0)
    if which == "fused":
        # round-5 deferred-norm A/B: the adopted "cat" engine vs "fused"
        # (cat + deferred instance norm riding the Pallas conv slab loads
        # + one-pass aligned finalize from kernel moments)
        t_ac = timed("aligned + cat kernel     ", run_aligned_cat, voxels)
        t_af = timed("aligned + fused norms    ", run_aligned_fused, voxels)
        print(f"fused-norm LR speedup: {t_ac / t_af:.3f}x")
        t_dc = timed("dual aligned + cat       ", run_dual_aligned_cat,
                     vox_dual)
        t_df = timed("dual aligned + fused     ", run_dual_aligned_fused,
                     vox_dual)
        print(f"fused-norm dual speedup: {t_dc / t_df:.3f}x")
        sys.exit(0)
    t_par = timed("parity grid + XLA tail  ", run_parity, voxels)
    t_al = timed("aligned grid + Pallas    ", run_aligned, voxels)
    print(f"LR engine speedup: {t_par / t_al:.3f}x")
    t_pp = timed("parity + pallas convs    ", run_parity_pallas, voxels)
    t_ap = timed("aligned + pallas convs   ", run_aligned_pallas, voxels)
    print(f"pallas-conv speedup: parity {t_par / t_pp:.3f}x, "
          f"aligned {t_al / t_ap:.3f}x")
    t_dp = timed("dual parity + XLA tail   ", run_dual_parity, vox_dual)
    t_da = timed("dual aligned + Pallas    ", run_dual_aligned, vox_dual)
    print(f"dual engine speedup: {t_dp / t_da:.3f}x")
