"""Host-side training datasets for the two stages.

Behavioral parity with the reference dataset classes
(/root/reference/utils/train_set.py):

  SRPatchDataset  <- TrainSetMultiple (train_set.py:225-434): per-subject HR
    volumes (2-channel image+label) plus slice-profile-blurred copies along x
    and y; each sample randomly picks the blur axis via a transpose coin
    flip, random-crops a patch, optionally applies nnUNet intensity
    transforms (data only — the blurred LR copy passes through, matching the
    reference's enable_spatial=False pipeline), simulates LR by rational
    B-spline downsampling (order 3 image / order 0 label), randomly zeroes
    the first/last context slice (p=0.1 each), and applies random flips plus
    an in-plane transpose coin flip. Serves both WDSR (2D, thin-z patches)
    and FLAVR (3D).

  SegSRDataset  <- TrainSetMultipleSegSREfficient (train_set.py:22-159):
    pseudo-HR volumes (img/seg/uncertainty) from stage 1; random crop of
    (ps_x+64, ps_y+64, ps_z*sep), flips, LR by strided slicing [::sep],
    uncertainty weight transform 1 - u/255*0.99, then the full dummy-2D
    spatial + intensity pipeline.

Outputs are channels-last: stage-1 (D, H, W, C) [or (X, Y, C) for 2D],
stage-2 dict of (D, H, W, 1) arrays. A simple `BatchLoader` stacks samples
and can prefetch to device.
"""

from __future__ import annotations

import os

import numpy as np

from ..io.volume import parse_image
from ..ops.blur import parse_kernel, blur_axis_np
from ..ops.bspline import resize_1d_np
from ..utils.pad import target_pad
from .normalize import zscore_normalization
from .transforms import TrainingTransforms


class SRPatchDataset:
    """Stage-1 SR patch sampler (TrainSetMultiple parity)."""

    def __init__(self, image_path, split_subjects, slice_thickness,
                 target_thickness, blur_kernel_file, blur_kernel_name,
                 patch_size, random_flip, preload=True, blur=True,
                 nnunet_transform=False, seed=0, device_lr_sim=False,
                 channels=2):
        if len(patch_size) == 2:
            patch_size = (*patch_size, 1)
        self.patch_size = tuple(patch_size)
        # channels=1: sr_mode='img' single-channel SR (image only, no label
        # channel — reference inference_smore sr_mode, sr_utils.py:42-43);
        # the RNG stream is IDENTICAL to the 2-channel path (the slice
        # happens at return), so 'img' and 'img+seg' runs stay comparable
        self.channels = int(channels)
        self.random_flip = random_flip
        self.blur = blur
        self.device_lr_sim = device_lr_sim
        self.slice_separation = float(slice_thickness / target_thickness)
        self.image_path = image_path
        self.rng = np.random.default_rng(seed)

        # anchored, sorted matching: the reference constructs exact
        # filenames (train_set.py:50 `each_subject+'_0000.h5'`), so a bare
        # substring match here could pick case_10 for subject case_1 (and
        # nondeterministically, via unsorted listdir) — including leaking a
        # val subject into training
        all_names = sorted(os.listdir(image_path))
        self.subjects = []
        for s in split_subjects:
            anchored = [x for x in all_names
                        if x.startswith(s + "_") or x.startswith(s + ".")]
            matches = anchored or [x for x in all_names if s in x]
            if matches:
                self.subjects.append(matches[0])

        self.transform = None
        if nnunet_transform:
            # intensity-only (enable_spatial=False), reference
            # train_set.py:259-277
            self.transform = TrainingTransforms(
                self.patch_size, enable_spatial=False,
                enable_uncertainty=self.blur,
                extra_keys=["seg", "img_lr"] if self.blur else ["seg"])

        self._slice_thickness = slice_thickness
        self._target_thickness = target_thickness
        self._blur_kernel_file = blur_kernel_file
        self._blur_kernel_name = blur_kernel_name

        self.imgs_hr, self.labels_hr = [], []
        self.filtered_x, self.filtered_y = [], []
        for name in self.subjects:
            img_hr, label_hr, fx, fy = self._load(name)
            self.imgs_hr.append(np.asarray(img_hr[:]) if preload else img_hr)
            self.labels_hr.append(np.asarray(label_hr[:]) if preload else label_hr)
            self.filtered_x.append(np.asarray(fx[:]) if preload and fx is not None else fx)
            self.filtered_y.append(np.asarray(fy[:]) if preload and fy is not None else fy)

    def _load(self, name):
        """Per-subject HR (x, y, z, c) volume + blurred copies in
        (z, c, x, y) layout (train_set.py:303-335)."""
        image, _, lr_axis, blur_fwhm, *_ = parse_image(
            os.path.join(self.image_path, name), self._slice_thickness,
            self._target_thickness)
        if name.endswith(".h5"):
            return (image["img_hr"], image["label_hr"],
                    image["image_x_rgb"] if self.blur else None,
                    image["image_y_rgb"] if self.blur else None)
        image = np.squeeze(image)
        if image.ndim == 3:
            image = image[..., np.newaxis]
        kernel = parse_kernel(self._blur_kernel_file, self._blur_kernel_name,
                              blur_fwhm)
        img_hr = image[..., :1]
        label_hr = image[..., 1:].astype(np.uint8)
        fx = fy = None
        if self.blur:
            # blur along x of (z, c, x, y): reference F.conv2d over dim 2
            image_x = image.transpose(2, 3, 0, 1)[:, 0:1]
            fx = blur_axis_np(image_x.astype(np.float32), kernel, axis=2)
            image_y = image.transpose(2, 3, 1, 0)[:, 0:1]
            fy = blur_axis_np(image_y.astype(np.float32), kernel, axis=2)
        return img_hr, label_hr, fx, fy

    def __len__(self):
        return len(self.subjects)

    def sample(self, i=None, rng=None):
        """Draw one (img_lr, img_hr) channels-last pair."""
        rng = rng or self.rng
        if i is None:
            i = int(rng.integers(0, len(self.subjects)))
        img_hr = self.imgs_hr[i]
        label_hr = self.labels_hr[i]
        img_lr_vol = None
        if self.blur:
            if rng.random() < 0.5:
                img_hr = np.transpose(img_hr[:], (1, 0, 2, 3))
                label_hr = np.transpose(label_hr[:], (1, 0, 2, 3))
                img_lr_vol = self.filtered_y[i]
            else:
                img_lr_vol = self.filtered_x[i]
        else:
            if rng.random() < 0.5:
                img_hr = np.transpose(img_hr[:], (1, 0, 2, 3))
                label_hr = np.transpose(label_hr[:], (1, 0, 2, 3))

        ps = self.patch_size
        sep = self.slice_separation
        x0 = int(rng.integers(0, max(img_hr.shape[0] - ps[0], 0) + 1))
        y0 = int(rng.integers(0, max(img_hr.shape[1] - ps[1], 0) + 1))
        z0 = int(rng.integers(0, max(img_hr.shape[2] - ps[2], 0) + 1))
        img = img_hr[x0:x0 + ps[0], y0:y0 + ps[1], z0:z0 + ps[2], :]
        lab = label_hr[x0:x0 + ps[0], y0:y0 + ps[1],
                       z0:z0 + ps[2], :].astype(np.float32)
        img = img.transpose(2, 3, 0, 1)  # (z, c, x, y)
        lab = lab.transpose(2, 3, 0, 1)

        target_shape = [max(s, p) for s, p in
                        zip(img.shape, (ps[2], 1, ps[0], ps[1]))]
        img, _ = target_pad(img, target_shape, mode="constant")
        lab, _ = target_pad(lab, target_shape, mode="constant")

        if self.blur:
            lr = img_lr_vol[z0:z0 + ps[2], :, x0:x0 + ps[0], y0:y0 + ps[1]]
            lr, _ = target_pad(lr, target_shape, mode="constant")
        else:
            lr = img.copy()

        if self.transform is not None:
            # transform layout: (c, z, x, y)
            d = {"data": img.transpose(1, 0, 2, 3),
                 "seg": lab.transpose(1, 0, 2, 3)}
            if self.blur:
                d["img_lr"] = lr.transpose(1, 0, 2, 3)
            out = self.transform(rng, **d)
            img = out["data"].transpose(1, 0, 2, 3)
            lab = out["seg"].transpose(1, 0, 2, 3)
            if self.blur:
                lr = out["img_lr"].transpose(1, 0, 2, 3)
            else:
                lr = img.copy()

        img_hr_p = np.concatenate([img, lab], axis=1)  # (z, 2, x, y)
        if self.device_lr_sim:
            # emit the pre-resize LR source; the rational downsample and the
            # zero-slice dropout run on device (data.device_sr_sim)
            img_lr_p = np.concatenate([lr, lab], axis=1)
        else:
            # simulate LR: B-spline downsample the through-plane (x) axis
            lr = resize_1d_np(lr.astype(np.float64), sep, axis=2, order=3)
            lab_lr = resize_1d_np(lab.astype(np.float64), sep, axis=2, order=0)
            img_lr_p = np.concatenate([lr, lab_lr], axis=1)

        img_hr_p = img_hr_p.transpose(1, 2, 0, 3)  # (c, x, z, y)
        img_lr_p = img_lr_p.transpose(1, 2, 0, 3)

        if not self.device_lr_sim:
            if img_hr_p.shape[2] > 1 and rng.random() < 0.1:
                img_lr_p[:, 0:1] = 0.0
            if img_hr_p.shape[2] > 1 and rng.random() < 0.1:
                img_lr_p[:, -1:] = 0.0

        if self.random_flip:
            for axis in (1, 2, 3):
                if rng.random() < 0.5:
                    img_hr_p = np.flip(img_hr_p, axis=axis)
                    img_lr_p = np.flip(img_lr_p, axis=axis)

        if rng.random() < 0.5:
            img_hr_p = img_hr_p.transpose(0, 1, 3, 2)
            img_lr_p = img_lr_p.transpose(0, 1, 3, 2)

        # torch squeezes the thin axis for 2D (WDSR); then layout to
        # channels-last: (c, x, z, y) -> (x, z, y, c)
        if self.patch_size[2] == 1:
            img_hr_p = img_hr_p[:, :, 0] if img_hr_p.shape[2] == 1 else img_hr_p[:, :, :, 0]
            img_lr_p = img_lr_p[:, :, 0] if img_lr_p.shape[2] == 1 else img_lr_p[:, :, :, 0]
        # order="C": astype's default order="K" preserves the flipped /
        # transposed strides, making the batch np.stack a slow strided
        # gather (measured ~60 ms per batch-32, experiments/loader_bench)
        lr_out = np.moveaxis(img_lr_p, 0, -1).astype(np.float32, order="C")
        hr_out = np.moveaxis(img_hr_p, 0, -1).astype(np.float32, order="C")
        if self.channels == 1:
            lr_out = lr_out[..., :1]
            hr_out = hr_out[..., :1]
        return lr_out, hr_out


class SegSRDataset:
    """Stage-2 dataset (TrainSetMultipleSegSREfficient parity)."""

    def __init__(self, image_path, split_subjects, slice_thickness,
                 target_thickness, patch_size_ori, target_patch_size,
                 random_flip=False, uncertainty=False, preload=True,
                 norm=True, seed=0, device_augment=False):
        self.patch_size = tuple(patch_size_ori)        # (x, y, z) crop size
        self.target_patch_size = tuple(target_patch_size)
        self.separation = int(slice_thickness / target_thickness)
        self.random_flip = random_flip
        self.uncertainty = uncertainty
        self.norm = norm
        self.device_augment = device_augment
        self.rng = np.random.default_rng(seed)

        self.imgs, self.labels, self.uncertainties = [], [], []
        for s in split_subjects:
            path = os.path.join(image_path, s + "_0000.h5")
            if not os.path.exists(path):
                path = os.path.join(image_path, s + ".h5")
            image, *_ = parse_image(path, slice_thickness, target_thickness)
            img, lab = image["img"], image["seg"]
            unc = image["uncertainty"] if uncertainty else None
            self.imgs.append(np.asarray(img[:]) if preload else img)
            self.labels.append(np.asarray(lab[:]) if preload else lab)
            self.uncertainties.append(
                np.asarray(unc[:]) if (preload and unc is not None) else unc)

        # zscore stats are VOLUME-wide, so normalizing once at load time is
        # identical to normalizing per draw — and per-draw it was the
        # loader's hottest op (a full-volume fp32 copy + two reduction
        # passes per SAMPLE, ~100 ms at pseudo-HR volume sizes;
        # experiments/loader_bench.py)
        self._prenormed = False
        if preload and norm:
            self.imgs = [zscore_normalization(np.asarray(v, np.float32))
                         for v in self.imgs]
            self._prenormed = True

        # dummy-2D spatial + intensity pipeline; uncertainty is continuous
        # (train_set.py:64-84). patch arg is (z, y, x) like the reference's
        # target_patch_size[::-1].
        self.transform = TrainingTransforms(
            tuple(target_patch_size[::-1]), enable_spatial=True,
            enable_uncertainty=uncertainty,
            extra_keys=["seg", "seg_sr", "uncertainty"] if uncertainty
            else ["seg", "seg_sr"])

    def __len__(self):
        return len(self.imgs)

    def sample(self, i=None, rng=None):
        rng = rng or self.rng
        if i is None:
            i = int(rng.integers(0, len(self.imgs)))
        img_vol = self.imgs[i]
        if not self._prenormed:
            img_vol = np.asarray(img_vol[:], dtype=np.float32)
            if self.norm:
                img_vol = zscore_normalization(img_vol)

        ps = self.patch_size
        sep = self.separation
        x0 = int(rng.integers(0, max(img_vol.shape[0] - ps[0], 0) + 1))
        y0 = int(rng.integers(0, max(img_vol.shape[1] - ps[1], 0) + 1))
        z0 = int(rng.integers(0, max(img_vol.shape[2] - ps[2] * sep, 0) + 1))
        sl = (slice(x0, x0 + ps[0]), slice(y0, y0 + ps[1]),
              slice(z0, z0 + ps[2] * sep))
        # crop BEFORE any dtype conversion: converting the full pseudo-HR
        # volume per sample was the dominant loader cost
        img = np.asarray(img_vol[sl], dtype=np.float32)
        label = np.asarray(self.labels[i][sl], dtype=np.float32)
        target_shape = [max(s, p) for s, p in
                        zip(img.shape, (ps[0], ps[1], ps[2] * sep))]
        img, _ = target_pad(img, target_shape, mode="constant")
        label, _ = target_pad(label, target_shape, mode="constant")
        if self.uncertainty:
            unc = np.asarray(self.uncertainties[i][sl], dtype=np.float32)
            unc, _ = target_pad(unc, target_shape, mode="constant")

        if self.random_flip:
            for axis in (0, 1, 2):
                if rng.random() < 0.5:
                    img = np.flip(img, axis=axis)
                    label = np.flip(label, axis=axis)
                    if self.uncertainty:
                        unc = np.flip(unc, axis=axis)

        img_lr = img[:, :, ::sep]
        label_lr = label[:, :, ::sep]

        # (x, y, z) -> transform layout (c=1, z, x, y)
        def to_c_zxy(a):
            return a.transpose(2, 0, 1)[None].copy()

        if self.device_augment:
            # raw crops; spatial + intensity augmentation happens on device
            # (rehrseg_tpu.data.device_aug.augment_seg_batch)
            def raw(a):
                return np.moveaxis(to_c_zxy(a), 0, -1).astype(np.float32)
            if self.uncertainty:
                unc_raw = 1.0 - raw(unc[:, :, ::sep]) / 255.0 * 0.99
            else:
                unc_raw = np.zeros_like(raw(label_lr))
            return {"img": raw(img_lr), "label_lr": raw(label_lr),
                    "label_hr": raw(label), "uncertainty_lr": unc_raw}

        d = {"data": to_c_zxy(img_lr), "seg": to_c_zxy(label_lr),
             "seg_sr": to_c_zxy(label)}
        if self.uncertainty:
            unc_lr = unc[:, :, ::sep]
            d["uncertainty"] = 1.0 - to_c_zxy(unc_lr) / 255.0 * 0.99
        out = self.transform(rng, **d)

        # channels-last (z, x, y, 1)
        def to_out(a):
            return np.moveaxis(a, 0, -1).astype(np.float32)

        return {
            "img": to_out(out["data"]),
            "label_lr": to_out(out["seg"]),
            "label_hr": to_out(out["seg_sr"]),
            "uncertainty_lr": to_out(out["uncertainty"])
            if self.uncertainty else np.zeros_like(to_out(out["seg"])),
        }


class BatchLoader:
    """Minimal batching iterator over a dataset's `sample()`.

    shard=(index, count): multi-host data parallelism. `batch_size` stays
    the GLOBAL batch; every host draws the same per-sample child seeds from
    the shared seeded stream (so the global batch is deterministic across
    the pod) but materializes ONLY its contiguous slice — disjoint by
    construction, matching `parallel.distributed.local_batch_slice`. With
    shard=None the original single-host RNG stream is byte-identical to
    previous releases (samples draw directly from `self.rng`).
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shard: tuple[int, int] | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        _check_shard(batch_size, shard)
        self.shard = shard

    def next(self):
        if self.shard is not None:
            index, count = self.shard
            per = self.batch_size // count
            # identical draw on every host -> agreed global batch
            seeds = self.rng.integers(0, 2 ** 63, size=self.batch_size)
            local = seeds[index * per:(index + 1) * per]
            samples = [self.dataset.sample(rng=np.random.default_rng(int(s)))
                       for s in local]
        else:
            samples = [self.dataset.sample(rng=self.rng)
                       for _ in range(self.batch_size)]
        return _stack_samples(samples)


def _stack_samples(samples):
    """Batch-stack a list of per-sample dicts/tuples — the ONE place the
    batch layout is defined (BatchLoader and the multiprocess workers must
    stay byte-identical)."""
    if isinstance(samples[0], dict):
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    n = len(samples[0])
    return tuple(np.stack([s[j] for s in samples]) for j in range(n))


def _check_shard(batch_size: int, shard):
    if shard is None:
        return
    index, count = shard
    if batch_size % count != 0:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"{count} processes")
    if not (0 <= index < count):
        raise ValueError(f"shard index {index} out of range [0,{count})")


def _mp_worker(dataset, task_q, out_q):
    while True:
        task = task_q.get()
        if task is None:
            break
        idx, seeds = task
        try:
            samples = [dataset.sample(rng=np.random.default_rng(int(s)))
                       for s in seeds]
            out_q.put((idx, "ok", _stack_samples(samples)))
        except Exception as e:  # noqa: BLE001 — surfaced to the parent
            out_q.put((idx, "err", f"{type(e).__name__}: {e}"))


class MultiprocessBatchLoader:
    """N fork()ed worker processes building whole batches in parallel.

    The reference feeds stage 2 with 4 torch DataLoader worker PROCESSES
    (train_all.py:508); this is the framework's equivalent for hosts with
    spare cores (the 1-core bench host gains nothing — measured input-
    bound verdict in experiments/loader_bench.py / docs/BENCHMARKS.md —
    but real TPU VMs have dozens of cores). fork() shares the preloaded
    volumes copy-on-write, so workers add no resident memory.

    Determinism: the parent draws one seed per sample from a seeded
    stream and workers materialize batches from those seeds; results
    re-order by batch index. The sample sequence is byte-identical to
    ``BatchLoader(dataset, batch_size, seed, shard=(0, 1))`` (the
    seeded-per-sample stream), regardless of num_workers.

    shard=(index, count): multi-host mode with the same semantics as
    BatchLoader — every host draws the full global seed list and
    materializes only its contiguous slice.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 2,
                 seed: int = 0, depth: int = 2,
                 shard: tuple[int, int] | None = None):
        import multiprocessing as mp

        _check_shard(batch_size, shard)
        self.shard = shard
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        # fork shares the preloaded volumes copy-on-write, but forking a
        # multi-threaded JAX-initialized parent is deadlock-prone if any
        # thread holds a lock at fork time (Python 3.12 warns about
        # exactly this). The liveness watchdog in next() turns a hung or
        # dead child into a loud error instead of a silent stall (which
        # on a pod would deadlock every other host at the next
        # collective); REHRSEG_MP_CONTEXT=spawn|forkserver opts into a
        # lock-safe start method when the dataset is cheap to pickle.
        ctx = mp.get_context(os.environ.get("REHRSEG_MP_CONTEXT", "fork"))
        self._task_q = ctx.Queue()
        self._out_q = ctx.Queue()
        self._procs = [ctx.Process(target=_mp_worker,
                                   args=(dataset, self._task_q, self._out_q),
                                   daemon=True)
                       for _ in range(int(num_workers))]
        for p in self._procs:
            p.start()
        self._inflight_cap = len(self._procs) + int(depth)
        self._next_submit = 0
        self._next_emit = 0
        self._buffer: dict = {}
        self._closed = False
        self._pump()

    def _pump(self):
        while self._next_submit - self._next_emit < self._inflight_cap:
            seeds = self.rng.integers(0, 2 ** 63, size=self.batch_size)
            if self.shard is not None:
                index, count = self.shard
                per = self.batch_size // count
                seeds = seeds[index * per:(index + 1) * per]
            self._task_q.put((self._next_submit, seeds))
            self._next_submit += 1

    def next(self):
        import queue as _queue

        if self._closed:
            raise RuntimeError("MultiprocessBatchLoader is closed")
        self._pump()
        while self._next_emit not in self._buffer:
            try:
                idx, status, item = self._out_q.get(timeout=5.0)
            except _queue.Empty:
                dead = [p for p in self._procs if not p.is_alive()]
                if dead:
                    self.close()
                    raise RuntimeError(
                        f"{len(dead)} loader worker process(es) died "
                        f"(exitcodes {[p.exitcode for p in dead]}) — a "
                        "crashed/OOM-killed child cannot report through "
                        "the queue; falling back to loader_workers=0 or "
                        "REHRSEG_MP_CONTEXT=spawn avoids fork-related "
                        "deaths") from None
                continue
            if status == "err":
                raise RuntimeError(f"loader worker failed: {item}")
            self._buffer[idx] = item
        out = self._buffer.pop(self._next_emit)
        self._next_emit += 1
        return out

    def close(self):
        if self._closed:
            return
        self._closed = True
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=3)
            if p.is_alive():
                p.terminate()


class PrefetchLoader:
    """Background-thread prefetch wrapper around a loader's `next()`.

    numpy/scipy release the GIL during heavy kernels, so batch i+1's host
    prep genuinely overlaps the (async-dispatched) device step i. Batch
    order is identical to the wrapped loader (single worker consumes the
    same RNG stream sequentially). Replaces the reference's torch
    DataLoader(num_workers=4) role (train_all.py:508) without
    multiprocessing — the right tradeoff on a 1-core host.
    """

    def __init__(self, loader, depth: int = 2):
        import queue
        import threading

        self.loader = loader
        self._queue_mod = queue
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def worker():
            while not self._stop.is_set():
                try:
                    item = self.loader.next()
                except Exception as e:
                    # surface the error at next() time, then KEEP serving —
                    # a transient failure must not kill a long training run
                    item = e
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def next(self):
        if self._stop.is_set():
            raise RuntimeError("PrefetchLoader is closed")
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so a worker blocked on put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except self._queue_mod.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self._stop.set()
        except Exception:
            pass
