"""Device-resident stage-1 patch sampling.

The measured loader study (docs/BENCHMARKS.md round 4) found stage-1
training INPUT-BOUND on this host: the best host sampling path delivers
164.8 samples/s against the chip's ~400 samples/s demand, because every
sample crops/flips/pads megabyte patches with host numpy (reference
equivalent: torch DataLoader workers, train_all.py:508). The TPU-first
fix: upload every subject's HR volume + its two pre-blurred copies to
HBM ONCE, draw only the tiny per-sample DECISIONS on the host (subject
index, transpose, crop origin, flips — a few dozen bytes), and execute
crop/transpose/pad/flip on device in one jitted, vmapped gather per
batch. The host RNG stream and decision ORDER are exactly
SRPatchDataset.sample's (datasets.py), so batches are bit-identical to
the host sampler at fixed seeds (tests/test_device_sampler.py) — the
parity stream is preserved, only the heavy data movement changes venue.

Covers the stage-1b/1c FLAVR hot path: device_lr_sim=True (the rational
downsample + zero-slice dropout already run on device,
data/device_sr_sim.py), no host transform (device_augment_sr covers
intensity aug on device), square in-plane patches (ps1 == ps2 > 1), and
2-channel (img+label) samples. Anything else falls back to the host
loader.

HBM cost: sum over subjects of canvas*(4 ch)*4 bytes; canvases are
square in-plane (transpose-safe) with a leading margin so the symmetric
small-volume padding of utils.pad.target_pad folds into the crop origin.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _canvas_from_dataset(ds):
    """Stack all subjects into one (S, Xc, Yc, Zc, 4) fp32 array with
    channels (img, label, blur_x, blur_y), each volume placed at the
    (margin, margin, margin) origin. Returns (canvas, shapes (S, 3))."""
    ps = ds.patch_size
    m = max(ps) // 2 + 1                     # symmetric-pad headroom
    xs = [v.shape[0] for v in ds.imgs_hr]
    ys = [v.shape[1] for v in ds.imgs_hr]
    zs = [v.shape[2] for v in ds.imgs_hr]
    side = max(max(xs), max(ys), ps[0], ps[1])
    zc = max(max(zs), ps[2])
    s = len(ds.imgs_hr)
    canvas = np.zeros((s, m + side + max(ps), m + side + max(ps),
                       m + zc + ps[2], 4), np.float32)
    shapes = np.zeros((s, 3), np.int32)
    for i in range(s):
        img = np.asarray(ds.imgs_hr[i])      # (X, Y, Z, 1)
        lab = np.asarray(ds.labels_hr[i])
        fx = np.asarray(ds.filtered_x[i])    # (Z, 1, X, Y) blur along x
        fy = np.asarray(ds.filtered_y[i])    # (Z, 1, Y, X) blur along y
        x, y, z = img.shape[:3]
        shapes[i] = (x, y, z)
        canvas[i, m:m + x, m:m + y, m:m + z, 0] = img[..., 0]
        canvas[i, m:m + x, m:m + y, m:m + z, 1] = lab[..., 0]
        canvas[i, m:m + x, m:m + y, m:m + z, 2] = fx.transpose(2, 3, 0, 1)[..., 0]
        canvas[i, m:m + x, m:m + y, m:m + z, 3] = fy.transpose(3, 2, 0, 1)[..., 0]
    return canvas, shapes, m


@partial(jax.jit, static_argnames=("ps",))
def _gather_batch(canvas, dec, ps):
    """dec: (B, 9) int32 rows (idx, t, x0, y0, z0, f1, f2, f3, t2) with
    crop origins already canvas-absolute (margin and symmetric pad offsets
    folded in by the host). Returns (lr_src, hr), each (B, ps0, ps2, ps1,
    2) in the host sampler's (x, z, y, c) output layout."""
    ps0, ps1, ps2 = ps

    def one(row):
        idx, t, x0, y0, z0, f1, f2, f3, t2 = [row[k] for k in range(9)]
        # The subject index MUST be part of ONE dynamic_slice on the
        # stacked canvas: an indexed lookup (dynamic_index_in_dim) under
        # vmap becomes a gather that materializes a FULL canvas volume
        # per sample before the crop — 79 GB at the stage-1 bench
        # geometry (measured: OOM on the 16 GB chip). A single slice
        # with the batched leading start keeps the vmapped gather
        # patch-sized.
        pa = lax.dynamic_slice(canvas, (idx, x0, y0, z0, 0),
                               (1, ps0, ps1, ps2, 4))[0]
        pb = lax.dynamic_slice(canvas, (idx, y0, x0, z0, 0),
                               (1, ps1, ps0, ps2, 4))[0]
        p = jnp.where(t.astype(bool), jnp.swapaxes(pb, 0, 1), pa)
        blur = jnp.where(t.astype(bool), p[..., 3], p[..., 2])
        hr = jnp.stack([p[..., 0], p[..., 1]], axis=-1)     # (x, y, z, 2)
        lr = jnp.stack([blur, p[..., 1]], axis=-1)
        hr = jnp.transpose(hr, (0, 2, 1, 3))                # (x, z, y, 2)
        lr = jnp.transpose(lr, (0, 2, 1, 3))
        for ax, f in ((0, f1), (1, f2), (2, f3)):
            hr = jnp.where(f.astype(bool), jnp.flip(hr, ax), hr)
            lr = jnp.where(f.astype(bool), jnp.flip(lr, ax), lr)
        # final in-plane swap (host: transpose(0, 1, 3, 2)); needs ps1==ps2
        hr = jnp.where(t2.astype(bool), jnp.swapaxes(hr, 1, 2), hr)
        lr = jnp.where(t2.astype(bool), jnp.swapaxes(lr, 1, 2), lr)
        return lr, hr

    return jax.vmap(one)(dec)


class DeviceSRPatchSampler:
    """Drop-in BatchLoader for SRPatchDataset(device_lr_sim=True) whose
    batches are device arrays gathered from HBM-resident volumes.

    shard=(index, count): identical semantics/stream to BatchLoader — every
    host draws the global per-sample seeds and materializes its slice.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shard=None):
        ps = dataset.patch_size
        if not (dataset.device_lr_sim and dataset.blur
                and dataset.transform is None and dataset.channels == 2
                and ps[1] == ps[2] and ps[2] > 1):
            raise ValueError(
                "DeviceSRPatchSampler covers the stage-1 FLAVR hot path: "
                "device_lr_sim=True, blur=True, no host transform, "
                "2 channels, square in-plane patch; got "
                f"ps={ps}, device_lr_sim={dataset.device_lr_sim}, "
                f"blur={dataset.blur}")
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shard = shard
        if shard is not None:
            index, count = shard
            if batch_size % count:
                raise ValueError(f"batch {batch_size} % shard {count}")
        canvas, self._shapes, self._margin = _canvas_from_dataset(dataset)
        self.hbm_bytes = canvas.nbytes
        self._canvas = jnp.asarray(canvas)
        self._ps = tuple(int(v) for v in dataset.patch_size)

    def _decisions(self, rng) -> np.ndarray:
        """One sample's decision row, drawing rng in EXACTLY the order of
        SRPatchDataset.sample (device_lr_sim branch) so fixed-seed streams
        are bit-identical to the host sampler."""
        ds, ps, m = self.ds, self._ps, self._margin
        i = int(rng.integers(0, len(ds.imgs_hr)))
        t = rng.random() < 0.5
        sx, sy, sz = (int(v) for v in self._shapes[i])
        s0, s1 = (sy, sx) if t else (sx, sy)
        x0 = int(rng.integers(0, max(s0 - ps[0], 0) + 1))
        y0 = int(rng.integers(0, max(s1 - ps[1], 0) + 1))
        z0 = int(rng.integers(0, max(sz - ps[2], 0) + 1))
        f1 = f2 = f3 = False
        if ds.random_flip:
            f1 = rng.random() < 0.5
            f2 = rng.random() < 0.5
            f3 = rng.random() < 0.5
        t2 = rng.random() < 0.5
        # fold the symmetric target_pad placement into the crop origin:
        # when the (transposed) extent is smaller than the patch, the host
        # pads (ps - s) split low/high with the LOW side getting the floor
        # — equivalently the crop origin backs up by the low pad
        lo0 = (ps[0] - s0) // 2 if s0 < ps[0] else 0
        lo1 = (ps[1] - s1) // 2 if s1 < ps[1] else 0
        lo2 = (ps[2] - sz) // 2 if sz < ps[2] else 0
        return np.asarray(
            [i, t, m + x0 - lo0, m + y0 - lo1, m + z0 - lo2,
             f1, f2, f3, t2], np.int32)

    def next(self):
        if self.shard is not None:
            index, count = self.shard
            per = self.batch_size // count
            seeds = self.rng.integers(0, 2 ** 63, size=self.batch_size)
            rows = [self._decisions(np.random.default_rng(int(s)))
                    for s in seeds[index * per:(index + 1) * per]]
        else:
            rows = [self._decisions(self.rng)
                    for _ in range(self.batch_size)]
        dec = jnp.asarray(np.stack(rows))
        return _gather_batch(self._canvas, dec, self._ps)

    def close(self):
        self._canvas = None
