"""Gaussian-weighted sliding-window inference engine (the TPU performance
centerpiece).

Capability parity with the reference hot loop
(/root/reference/utils/seg_utils.py:176-287,736-784): tile the volume with
step = patch * 0.5 (steps evenly redistributed), run the network per tile
with full 8-way mirror test-time augmentation, accumulate
``prediction * gaussian`` into a logits buffer plus a weight buffer, divide
at the end. The HR head rescales the z-dim of every slicer by the slice
separation (seg_utils.py:273-274).

TPU-first redesign (SURVEY.md §7.6):
  - the whole tile loop is ONE jitted ``lax.scan`` — no per-tile host round
    trips (the reference launches each tile from Python);
  - mirror TTA is a single batched forward of all 8 flip combinations
    (the reference runs 8 sequential forwards, seg_utils.py:201-227);
  - accumulation happens in fp32 HBM buffers via dynamic_update_slice inside
    the scan (the reference uses fp16 buffers and risks inf, which it guards
    against at seg_utils.py:280-283 — fp32 on TPU is both safer and fast);
  - tile start coordinates are a traced integer array, so volumes with the
    same padded shape and tile grid reuse one compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.gaussian import compute_gaussian
from ..utils.pad import target_pad, crop


def compute_steps_for_sliding_window(image_size, tile_size, tile_step_size):
    """Evenly redistributed tile starts per dim (seg_utils.py:176-199)."""
    assert all(i >= j for i, j in zip(image_size, tile_size)), \
        "image size must be as large or larger than patch_size"
    assert 0 < tile_step_size <= 1

    target_step = [i * tile_step_size for i in tile_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1
                 for i, j, k in zip(image_size, target_step, tile_size)]
    steps = []
    for dim in range(len(tile_size)):
        max_step_value = image_size[dim] - tile_size[dim]
        if num_steps[dim] > 1:
            actual = max_step_value / (num_steps[dim] - 1)
        else:
            actual = 1e13
        steps.append([int(np.round(actual * i)) for i in range(num_steps[dim])])
    return steps


def sliding_window_starts(image_size, patch_size, tile_step_size=0.5) -> np.ndarray:
    """All (z, y, x) tile start coordinates as an (N, 3) int32 array."""
    steps = compute_steps_for_sliding_window(image_size, patch_size,
                                             tile_step_size)
    starts = [(sx, sy, sz) for sx in steps[0] for sy in steps[1]
              for sz in steps[2]]
    return np.asarray(starts, dtype=np.int32)


def _flip_axes_combinations(ndim_spatial: int = 3):
    """Identity + all 2^n - 1 mirror combinations over spatial axes 0..n-1
    (reference mirror order, seg_utils.py:213-215)."""
    import itertools
    combos = [()]
    for i in range(ndim_spatial):
        combos.extend(itertools.combinations(range(ndim_spatial), i + 1))
    return combos


def _mirror_batch(tile: jnp.ndarray, combos):
    """(D, H, W, C) -> (8, D, H, W, C) stacking every flip combination."""
    return jnp.stack([jnp.flip(tile, axis=c) if c else tile for c in combos])


def _unmirror_mean(preds: jnp.ndarray, combos):
    """Invert each flip and average over the TTA batch."""
    parts = [jnp.flip(preds[i], axis=c) if c else preds[i]
             for i, c in enumerate(combos)]
    return sum(parts) / len(parts)


def _mesh_axis(mesh, name):
    return name if (mesh is not None and name in mesh.axis_names and
                    mesh.shape[name] > 1) else None


@partial(jax.jit, static_argnames=("model_fn", "patch_size", "out_shape",
                                   "z_scale", "mirror", "num_classes",
                                   "tta_mesh", "tiles_per_step",
                                   "need_weights"))
def _sliding_window_scan(model_fn: Callable, params, data: jnp.ndarray,
                         starts: jnp.ndarray, gaussian: jnp.ndarray,
                         patch_size: tuple, out_shape: tuple, z_scale: int,
                         mirror: bool, num_classes: int, tta_mesh=None,
                         tiles_per_step: int = 1, need_weights: bool = True):
    """Jitted tile loop. data: (D, H, W, C); returns (logits, weights).

    Multi-chip sharding of ONE volume via ``tta_mesh`` (a Mesh; despite the
    historical name it supports both axes):

      - a 'data' axis shards the 8-way mirror-TTA batch — one flip per
        device, zero cross-device communication inside the model;
      - a 'spatial' axis shards the tile's H dimension through the model
        forward — XLA's SPMD partitioner inserts the halo exchanges every
        conv needs at shard boundaries, and the volume + accumulator
        buffers shard along H so no device holds the whole volume (the TPU
        answer to volumes larger than one chip's HBM; the reference can
        only tile within a single GPU, seg_utils.py:229-287).

    Both can combine on a 2-D ('data', 'spatial') mesh. Results are
    bit-identical to the single-device pass (tests/test_tta_mesh.py).

    tiles_per_step: batch k tiles' mirror stacks into ONE forward of
    k*n_tta — bigger batches utilize the MXU better and amortize per-step
    overhead; the packed eval path's 4x smaller activations make k=2
    fit in HBM at the reference patch size. The caller pads the start list
    to a multiple of k; padded entries carry validity 0 in ``starts``'
    fourth column and contribute NOTHING to the accumulators (a plain
    repeat would double-weight that tile in overlap regions).

    need_weights=False (label-map outputs): skips the weight-accumulator
    slice/add/update per tile and returns (logits, None). Valid because
    argmax(logits / weights) == argmax(logits) — the gaussian weight sum
    is a strictly positive per-voxel scalar (compute_gaussian clamps zeros
    to the min nonzero value), so the normalization is order-preserving.
    The probability APIs keep weights.
    """
    pd, ph, pw = patch_size
    od = pd * z_scale
    combos = _flip_axes_combinations(3) if mirror else [()]

    data_ax = _mesh_axis(tta_mesh, "data")
    spatial_ax = _mesh_axis(tta_mesh, "spatial")

    def shard(x, spec):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return lax.with_sharding_constraint(
            x, NamedSharding(tta_mesh, spec))

    if spatial_ax:
        from jax.sharding import PartitionSpec as P
        data = shard(data, P(None, spatial_ax))

    logits0 = jnp.zeros((*out_shape, num_classes), dtype=jnp.float32)
    weights0 = jnp.zeros(out_shape if need_weights else (1, 1, 1),
                         dtype=jnp.float32)
    if spatial_ax:
        from jax.sharding import PartitionSpec as P
        logits0 = shard(logits0, P(None, spatial_ax))
        if need_weights:
            weights0 = shard(weights0, P(None, spatial_ax))

    k = int(tiles_per_step)
    n_tta = len(combos)

    def tile_step(carry, start_k):
        # start_k: (k, 4) rows of (sx, sy, sz, valid) for ONE batched fwd
        logits_buf, weight_buf = carry
        tiles = [lax.dynamic_slice(
            data, (start_k[j, 0], start_k[j, 1], start_k[j, 2], 0),
            (pd, ph, pw, data.shape[-1])) for j in range(k)]
        batch = jnp.concatenate([_mirror_batch(t, combos) for t in tiles]) \
            if k > 1 else _mirror_batch(tiles[0], combos)
        if data_ax or spatial_ax:
            from jax.sharding import PartitionSpec as P
            batch = shard(batch, P(data_ax, None, spatial_ax))
        preds = model_fn(params, batch)  # (k*n_tta, od, ph, pw, classes)
        for j in range(k):
            valid = start_k[j, 3].astype(jnp.float32)
            g_j = gaussian * valid
            pred = _unmirror_mean(preds[j * n_tta:(j + 1) * n_tta], combos)
            pred = pred.astype(jnp.float32) * g_j[..., None]
            sx, sy, sz = start_k[j, 0], start_k[j, 1], start_k[j, 2]
            zo = sx * z_scale
            cur = lax.dynamic_slice(logits_buf, (zo, sy, sz, 0),
                                    (od, ph, pw, num_classes))
            logits_buf = lax.dynamic_update_slice(logits_buf, cur + pred,
                                                  (zo, sy, sz, 0))
            if need_weights:
                curw = lax.dynamic_slice(weight_buf, (zo, sy, sz),
                                         (od, ph, pw))
                weight_buf = lax.dynamic_update_slice(weight_buf, curw + g_j,
                                                      (zo, sy, sz))
        return (logits_buf, weight_buf), None

    starts_k = starts.reshape(-1, k, starts.shape[-1])
    (logits, weights), _ = lax.scan(tile_step, (logits0, weights0), starts_k)
    return logits, (weights if need_weights else None)


from functools import lru_cache


@lru_cache(maxsize=32)
def _device_gaussian(out_patch: tuple, use_gaussian: bool):
    """Gaussian importance map cached ON DEVICE (it re-uploads megabytes per
    volume otherwise, and host<->device bandwidth is scarce on a tunneled
    chip)."""
    if use_gaussian:
        g = compute_gaussian(out_patch, 1.0 / 8, 10.0)
    else:
        g = np.ones(out_patch, dtype=np.float32)
    return jnp.asarray(g)


@lru_cache(maxsize=64)
def _device_starts(image_size: tuple, patch_size: tuple,
                   tile_step_size: float, tiles_per_step: int = 1):
    """(N', 4) rows of (sx, sy, sz, valid): padded to a multiple of
    tiles_per_step with valid=0 rows whose contributions are masked out."""
    starts = sliding_window_starts(image_size, patch_size, tile_step_size)
    valid = np.ones((len(starts), 1), starts.dtype)
    rem = (-len(starts)) % tiles_per_step
    rows = np.concatenate([starts, valid], axis=1)
    if rem:
        pad = np.concatenate([np.repeat(starts[-1:], rem, 0),
                              np.zeros((rem, 1), starts.dtype)], axis=1)
        rows = np.concatenate([rows, pad])
    return jnp.asarray(rows)


def _run_sliding_window(model_fn: Callable, params, data: np.ndarray,
                        patch_size, slice_separation, tile_step_size,
                        use_gaussian, mirror, num_classes,
                        input_dtype=jnp.bfloat16, tta_mesh=None,
                        tiles_per_step: int = 1, need_weights: bool = True):
    """Shared device-side pass; returns (logits, weights) ON DEVICE.

    Uploads the volume as bf16 by default — the normalized input easily fits
    bf16 precision and host<->device bandwidth is the scarce resource on a
    tunneled chip.
    """
    patch_size = tuple(int(p) for p in patch_size)
    out_patch = (patch_size[0] * slice_separation,) + patch_size[1:]
    g = _device_gaussian(out_patch, bool(use_gaussian))
    starts = _device_starts(tuple(data.shape[:3]), patch_size,
                            float(tile_step_size), int(tiles_per_step))
    out_shape = (data.shape[0] * slice_separation, data.shape[1], data.shape[2])
    dev_data = jnp.asarray(np.asarray(data, dtype=np.float32), dtype=input_dtype) \
        if input_dtype is not None else jnp.asarray(data)
    return _sliding_window_scan(
        model_fn, params, dev_data, starts,
        g, patch_size, out_shape, int(slice_separation),
        bool(mirror), int(num_classes), tta_mesh,
        tiles_per_step=int(tiles_per_step), need_weights=bool(need_weights))


def predict_sliding_window_logits(model_fn: Callable, params,
                                  data: np.ndarray,
                                  patch_size: Sequence[int],
                                  *,
                                  slice_separation: int = 1,
                                  tile_step_size: float = 0.5,
                                  use_gaussian: bool = True,
                                  mirror: bool = True,
                                  num_classes: int = 2,
                                  input_dtype=jnp.bfloat16) -> np.ndarray:
    """Full sliding-window prediction of one volume.

    model_fn(params, batch) must map (B, pd, ph, pw, C) ->
    (B, pd*slice_separation, ph, pw, num_classes): the head selection
    (LR vs HR) is folded into model_fn by the caller.

    data: (D, H, W, C) numpy volume (already normalized). Returns
    (D*slice_separation, H, W, num_classes) fp32 logits.
    """
    logits, weights = _run_sliding_window(
        model_fn, params, data, patch_size, slice_separation, tile_step_size,
        use_gaussian, mirror, num_classes, input_dtype)
    logits = np.asarray(logits / weights[..., None])
    if np.any(np.isinf(logits)):
        raise RuntimeError("Encountered inf in predicted array.")
    return logits


@partial(jax.jit, static_argnames=("model_fn", "patch_size", "out_shape",
                                   "z_scale", "mirror", "num_classes",
                                   "need_weights"))
def _sliding_window_scan_dual(model_fn: Callable, params, data: jnp.ndarray,
                              starts: jnp.ndarray, gaussian_lr: jnp.ndarray,
                              gaussian_hr: jnp.ndarray, patch_size: tuple,
                              out_shape: tuple, z_scale: int, mirror: bool,
                              num_classes: int, need_weights: bool = True):
    """Dual-head tile loop: model_fn returns (lr_pred, hr_pred); both heads
    accumulate in one pass sharing the encoder/decoder compute.

    The reference runs the entire sliding window twice for HR results
    (seg_utils.py:753 + 775); here the second head is nearly free.
    """
    pd, ph, pw = patch_size
    od_hr = pd * z_scale
    combos = _flip_axes_combinations(3) if mirror else [()]

    d_lr, h_, w_ = out_shape
    wshape_lr = (d_lr, h_, w_) if need_weights else (1, 1, 1)
    wshape_hr = (d_lr * z_scale, h_, w_) if need_weights else (1, 1, 1)
    logits_lr0 = jnp.zeros((d_lr, h_, w_, num_classes), dtype=jnp.float32)
    weights_lr0 = jnp.zeros(wshape_lr, dtype=jnp.float32)
    logits_hr0 = jnp.zeros((d_lr * z_scale, h_, w_, num_classes),
                           dtype=jnp.float32)
    weights_hr0 = jnp.zeros(wshape_hr, dtype=jnp.float32)

    def tile_step(carry, start):
        llr, wlr, lhr, whr = carry
        sx, sy, sz = start[0], start[1], start[2]
        tile = lax.dynamic_slice(
            data, (sx, sy, sz, 0), (pd, ph, pw, data.shape[-1]))
        batch = _mirror_batch(tile, combos)
        pred_lr_b, pred_hr_b = model_fn(params, batch)
        pred_lr = _unmirror_mean(pred_lr_b, combos).astype(jnp.float32)
        pred_hr = _unmirror_mean(pred_hr_b, combos).astype(jnp.float32)

        cur = lax.dynamic_slice(llr, (sx, sy, sz, 0), (pd, ph, pw, num_classes))
        llr = lax.dynamic_update_slice(
            llr, cur + pred_lr * gaussian_lr[..., None], (sx, sy, sz, 0))
        if need_weights:
            curw = lax.dynamic_slice(wlr, (sx, sy, sz), (pd, ph, pw))
            wlr = lax.dynamic_update_slice(wlr, curw + gaussian_lr,
                                           (sx, sy, sz))

        zo = sx * z_scale
        cur = lax.dynamic_slice(lhr, (zo, sy, sz, 0),
                                (od_hr, ph, pw, num_classes))
        lhr = lax.dynamic_update_slice(
            lhr, cur + pred_hr * gaussian_hr[..., None], (zo, sy, sz, 0))
        if need_weights:
            curw = lax.dynamic_slice(whr, (zo, sy, sz), (od_hr, ph, pw))
            whr = lax.dynamic_update_slice(whr, curw + gaussian_hr,
                                           (zo, sy, sz))
        return (llr, wlr, lhr, whr), None

    carry, _ = lax.scan(tile_step,
                        (logits_lr0, weights_lr0, logits_hr0, weights_hr0),
                        starts)
    return carry


def predict_sliding_window_dual_labels(model_fn: Callable, params,
                                       data: np.ndarray, patch_size,
                                       *, slice_separation: int,
                                       tile_step_size: float = 0.5,
                                       use_gaussian: bool = True,
                                       mirror: bool = True,
                                       num_classes: int = 2,
                                       input_dtype=jnp.bfloat16):
    """One-pass LR+HR prediction: returns (lr_labels, hr_labels) uint8.

    model_fn(params, batch) -> (lr_logits, hr_logits) with HR z-upscaled by
    slice_separation.
    """
    patch_size = tuple(int(p) for p in patch_size)
    g_lr = _device_gaussian(patch_size, bool(use_gaussian))
    g_hr = _device_gaussian(
        (patch_size[0] * slice_separation,) + patch_size[1:],
        bool(use_gaussian))
    starts = _device_starts(tuple(data.shape[:3]), patch_size,
                            float(tile_step_size))
    out_shape = tuple(data.shape[:3])
    dev_data = jnp.asarray(np.asarray(data, dtype=np.float32),
                           dtype=input_dtype)
    llr, _, lhr, _ = _sliding_window_scan_dual(
        model_fn, params, dev_data, starts, g_lr, g_hr, patch_size,
        out_shape, int(slice_separation), bool(mirror), int(num_classes),
        need_weights=False)
    return (np.asarray(_argmax_uint8(llr)),
            np.asarray(_argmax_uint8(lhr)))


@partial(jax.jit, static_argnames=())
def _argmax_uint8(logits, weights=None):
    """argmax label map; dividing by the (strictly positive) weight sum
    cannot change the argmax, so label paths skip it entirely."""
    if weights is not None:
        logits = logits / weights[..., None]
    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)


def predict_sliding_window_labels_streamed(model_fn: Callable, params,
                                           data: np.ndarray, patch_size,
                                           *, z_slab_tiles: int = 2,
                                           tile_step_size: float = 0.5,
                                           use_gaussian: bool = True,
                                           mirror: bool = True,
                                           num_classes: int = 2,
                                           input_dtype=jnp.bfloat16) -> np.ndarray:
    """Sliding-window prediction for volumes LARGER than one chip's HBM.

    The tile grid is grouped by z-start; each group of ``z_slab_tiles``
    consecutive z-rows forms a slab [z_lo, z_hi+pd) that is uploaded alone,
    scanned on device with slab-sized accumulation buffers, and merged into
    host fp32 buffers. Overlapping tiles across slab boundaries accumulate
    correctly because the weighted sums are additive — the output is exactly
    the single-pass result (SURVEY.md §5: the reference handles big volumes
    only by tiling within one GPU; this streams slabs so the device never
    holds the whole volume).
    """
    patch_size = tuple(int(p) for p in patch_size)
    pd = patch_size[0]
    steps = compute_steps_for_sliding_window(data.shape[:3], patch_size,
                                             tile_step_size)
    z_starts, y_steps, x_steps = steps

    d, h, w = data.shape[:3]
    logits_host = np.zeros((d, h, w, num_classes), dtype=np.float32)

    for g0 in range(0, len(z_starts), z_slab_tiles):
        group = z_starts[g0:g0 + z_slab_tiles]
        z_lo = group[0]
        z_hi = group[-1] + pd
        slab = data[z_lo:z_hi]
        starts = np.asarray(
            [(sz - z_lo, sy, sx, 1) for sz in group for sy in y_steps
             for sx in x_steps], dtype=np.int32)
        g = _device_gaussian(patch_size, bool(use_gaussian))
        dev_slab = jnp.asarray(np.asarray(slab, np.float32), dtype=input_dtype)
        logits, _ = _sliding_window_scan(
            model_fn, params, dev_slab, jnp.asarray(starts), g, patch_size,
            tuple(slab.shape[:3]), 1, bool(mirror), int(num_classes),
            need_weights=False)
        logits_host[z_lo:z_hi] += np.asarray(logits)

    return np.argmax(logits_host, axis=-1).astype(np.uint8)


def predict_sliding_window_dual_labels_streamed(
        model_fn: Callable, params, data: np.ndarray, patch_size,
        *, slice_separation: int, z_slab_tiles: int = 2,
        tile_step_size: float = 0.5, use_gaussian: bool = True,
        mirror: bool = True, num_classes: int = 2,
        input_dtype=jnp.bfloat16):
    """Streamed LR+HR prediction for volumes larger than one chip's HBM.

    The HR head is the case that NEEDS streaming most — its output is
    slice_separation x the voxels (the reference rescales the slicer z for
    the HR pass, seg_utils.py:273-274, 775-784). Tiles group into z-slabs
    exactly as :func:`predict_sliding_window_labels_streamed`; each slab
    keeps slab-local LR AND HR accumulators on device and merges them into
    host fp32 buffers at z-offset (and z-offset x sep for HR). Additivity
    of the gaussian-weighted sums makes the result exactly equal to the
    one-pass dual path (tests/test_sliding_window.py).

    Returns (lr_labels, hr_labels) uint8.
    """
    patch_size = tuple(int(p) for p in patch_size)
    pd = patch_size[0]
    sep = int(slice_separation)
    z_starts, y_steps, x_steps = compute_steps_for_sliding_window(
        data.shape[:3], patch_size, tile_step_size)

    d, h, w = data.shape[:3]
    llr_host = np.zeros((d, h, w, num_classes), dtype=np.float32)
    lhr_host = np.zeros((d * sep, h, w, num_classes), dtype=np.float32)

    g_lr = _device_gaussian(patch_size, bool(use_gaussian))
    g_hr = _device_gaussian((pd * sep,) + patch_size[1:], bool(use_gaussian))

    for g0 in range(0, len(z_starts), z_slab_tiles):
        group = z_starts[g0:g0 + z_slab_tiles]
        z_lo = group[0]
        z_hi = group[-1] + pd
        slab = data[z_lo:z_hi]
        starts = np.asarray(
            [(sz - z_lo, sy, sx, 1) for sz in group for sy in y_steps
             for sx in x_steps], dtype=np.int32)
        dev_slab = jnp.asarray(np.asarray(slab, np.float32),
                               dtype=input_dtype)
        llr, _, lhr, _ = _sliding_window_scan_dual(
            model_fn, params, dev_slab, jnp.asarray(starts), g_lr, g_hr,
            patch_size, tuple(slab.shape[:3]), sep, bool(mirror),
            int(num_classes), need_weights=False)
        llr_host[z_lo:z_hi] += np.asarray(llr)
        lhr_host[z_lo * sep:z_hi * sep] += np.asarray(lhr)

    return (np.argmax(llr_host, -1).astype(np.uint8),
            np.argmax(lhr_host, -1).astype(np.uint8))


def predict_sliding_window_labels_many(model_fn: Callable, params,
                                       volumes, patch_size,
                                       *, slice_separation: int = 1,
                                       tile_step_size: float = 0.5,
                                       use_gaussian: bool = True,
                                       mirror: bool = True,
                                       num_classes: int = 2,
                                       input_dtype=jnp.bfloat16,
                                       tiles_per_step: int = 1):
    """Throughput-oriented multi-volume prediction.

    JAX dispatch is asynchronous: all volumes' scans are enqueued first, so
    volume i+1's host->device upload and volume i's label download overlap
    with device compute — on a tunneled chip the transfers otherwise add
    ~25% per volume. Yields uint8 label maps in order.
    """
    pending = []
    for data in volumes:
        logits, _ = _run_sliding_window(
            model_fn, params, data, patch_size, slice_separation,
            tile_step_size, use_gaussian, mirror, num_classes, input_dtype,
            tiles_per_step=tiles_per_step, need_weights=False)
        pending.append(_argmax_uint8(logits))
    return [np.asarray(p) for p in pending]


def predict_sliding_window_labels(model_fn: Callable, params,
                                  data: np.ndarray,
                                  patch_size: Sequence[int],
                                  *,
                                  slice_separation: int = 1,
                                  tile_step_size: float = 0.5,
                                  use_gaussian: bool = True,
                                  mirror: bool = True,
                                  num_classes: int = 2,
                                  input_dtype=jnp.bfloat16,
                                  tta_mesh=None,
                                  tiles_per_step: int = 1) -> np.ndarray:
    """Like :func:`predict_sliding_window_logits` but argmaxes ON DEVICE and
    fetches only the uint8 label map — 8x less tunnel traffic, the right
    call when probabilities aren't needed (argmax(softmax) == argmax).

    tta_mesh: optional Mesh with a 'data' axis to shard the mirror-TTA batch
    across chips (one flip per device)."""
    logits, _ = _run_sliding_window(
        model_fn, params, data, patch_size, slice_separation, tile_step_size,
        use_gaussian, mirror, num_classes, input_dtype, tta_mesh,
        tiles_per_step, need_weights=False)
    return np.asarray(_argmax_uint8(logits))


# --------------------------------------------------------------- aligned grid
#
# The reference tile grid (compute_steps_for_sliding_window) yields starts
# like W in {0, 124, 249} — offsets Mosaic cannot DMA to and XLA's
# dynamic_update_slice handles via a masked slow path (measured 1.5x slower
# than 128-aligned offsets, experiments/tail_fuse.py). The ALIGNED grid
# snaps H starts to multiples of 8 and W starts to multiples of 128 (the
# fp32 (H, W)-plane tiling), padding the volume just enough that the last
# start still touches the far edge. Same tile count, same 0.5-step overlap
# structure — NOT bit-identical to the reference grid, so it is opt-in
# (tile_grid="aligned") and the parity grid stays the default.

_ALIGN_HW = (8, 128)


def aligned_sliding_window_starts(image_size, patch_size,
                                  tile_step_size=0.5):
    """Aligned tile grid. Returns (starts (N, 4) int32 rows of
    (sx, sy, sz, valid), padded_size (D, H', W'))."""
    steps = compute_steps_for_sliding_window(image_size, patch_size,
                                             tile_step_size)
    out_steps = [list(steps[0])]
    padded = [int(image_size[0])]
    for dim, snap in zip((1, 2), _ALIGN_HW):
        n = len(steps[dim])
        if n == 1:
            out_steps.append([0])
            padded.append(int(image_size[dim]))
            continue
        span = image_size[dim] - patch_size[dim]
        span_pad = -(-span // snap) * snap
        actual = span_pad / (n - 1)
        ss = [int(np.round(actual * i / snap)) * snap for i in range(n)]
        ss[-1] = span_pad
        ss = sorted(set(ss))
        # COVERAGE GUARD: snapping can open a gap wider than the patch when
        # patch_size[dim] is small relative to the snap (e.g. a 16-wide
        # patch with the 128 W-snap) — every voxel must be under a tile.
        # Rebuild the axis with the widest aligned step that still covers;
        # impossible when the patch is narrower than the snap.
        if any(b - a > patch_size[dim] for a, b in zip(ss, ss[1:])):
            max_step = patch_size[dim] // snap * snap
            if max_step == 0:
                raise ValueError(
                    f"aligned tile grid needs patch_size[{dim}] "
                    f"({patch_size[dim]}) >= its snap ({snap}) when the "
                    f"axis takes more than one tile; use the parity grid")
            ss = sorted(set(list(range(0, span_pad, max_step))
                            + [span_pad]))
        out_steps.append(ss)
        padded.append(int(patch_size[dim] + span_pad))
    starts = [(sx, sy, sz, 1) for sx in out_steps[0] for sy in out_steps[1]
              for sz in out_steps[2]]
    return np.asarray(starts, dtype=np.int32), tuple(padded)


def _mirror_batch_zgrouped(tile: jnp.ndarray):
    from ..ops.pallas_tail import zgrouped_combos
    return jnp.stack([jnp.flip(tile, axis=c) if c else tile
                      for c in zgrouped_combos()])


@partial(jax.jit, static_argnames=("model_fn", "patch_size", "out_shape",
                                   "z_scale", "num_classes", "interpret"))
def _sliding_window_scan_aligned(model_fn: Callable, params,
                                 data: jnp.ndarray, starts: jnp.ndarray,
                                 gaussian: jnp.ndarray, patch_size: tuple,
                                 out_shape: tuple, z_scale: int,
                                 num_classes: int, interpret: bool):
    """Aligned-grid tile loop with the fused Pallas accumulate kernel.

    model_fn(params, batch) must return per-class PLANES
    (8, C, pd*z_scale, ph, pw) for a z-grouped mirror batch (the packed
    model's plane_out=True). Accumulates into a (C, D*z_scale, H, W) fp32
    buffer via ops.pallas_tail.accumulate_tta_tile — unmirror + mean +
    gaussian + scatter-add in ONE pass over the predictions.
    """
    from ..ops.pallas_tail import accumulate_tta_tile

    pd, ph, pw = patch_size
    logits0 = jnp.zeros((num_classes, out_shape[0] * z_scale,
                         out_shape[1], out_shape[2]), jnp.float32)

    def tile_step(logits, start):
        tile = lax.dynamic_slice(
            data, (start[0], start[1], start[2], 0),
            (pd, ph, pw, data.shape[-1]))
        batch = _mirror_batch_zgrouped(tile)
        preds = model_fn(params, batch)
        logits = accumulate_tta_tile(logits, preds, gaussian, start,
                                     z_scale=z_scale, interpret=interpret)
        return logits, None

    logits, _ = lax.scan(tile_step, logits0, starts)
    return logits


def _aligned_prep(data, patch_size, tile_step_size, use_gaussian,
                  slice_separation, input_dtype, interpret):
    patch_size = tuple(int(p) for p in patch_size)
    starts, padded = aligned_sliding_window_starts(
        data.shape[:3], patch_size, tile_step_size)
    pads = [(0, padded[i] - data.shape[i]) for i in range(3)]
    if any(p[1] for p in pads):
        data = np.pad(data, pads + [(0, 0)])
    g = _device_gaussian(
        (patch_size[0] * slice_separation,) + patch_size[1:],
        bool(use_gaussian))
    dev = jnp.asarray(np.asarray(data, np.float32), dtype=input_dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return dev, jnp.asarray(starts), g, patch_size, tuple(data.shape[:3]), \
        bool(interpret)


def predict_sliding_window_labels_aligned(model_fn: Callable, params,
                                          data: np.ndarray, patch_size,
                                          *, tile_step_size: float = 0.5,
                                          use_gaussian: bool = True,
                                          num_classes: int = 2,
                                          input_dtype=jnp.bfloat16,
                                          interpret: bool | None = None
                                          ) -> np.ndarray:
    """Aligned-grid label prediction (always 8-way mirror TTA — the fused
    kernel is specialized to it). model_fn must emit per-class planes.
    Returns (D, H, W) uint8 cropped to the input size."""
    d0, h0, w0 = data.shape[:3]
    dev, starts, g, patch_size, shape, interp = _aligned_prep(
        data, patch_size, tile_step_size, use_gaussian, 1, input_dtype,
        interpret)
    logits = _sliding_window_scan_aligned(
        model_fn, params, dev, starts, g, patch_size, shape, 1,
        int(num_classes), interp)
    lab = np.asarray(_argmax0_uint8(logits))
    return lab[:d0, :h0, :w0]


_argmax0_uint8 = jax.jit(lambda l: jnp.argmax(l, 0).astype(jnp.uint8))


def predict_sliding_window_labels_aligned_many(
        model_fn: Callable, params, volumes, patch_size,
        *, tile_step_size: float = 0.5, use_gaussian: bool = True,
        num_classes: int = 2, input_dtype=jnp.bfloat16,
        interpret: bool | None = None):
    """Throughput-oriented multi-volume aligned-grid prediction: all scans
    are dispatched before any label fetch, so uploads/fetches overlap
    device compute (the aligned analogue of
    :func:`predict_sliding_window_labels_many`)."""
    pending = []
    shapes = []
    for data in volumes:
        shapes.append(data.shape[:3])
        dev, starts, g, patch, shape, interp = _aligned_prep(
            data, patch_size, tile_step_size, use_gaussian, 1, input_dtype,
            interpret)
        logits = _sliding_window_scan_aligned(
            model_fn, params, dev, starts, g, patch, shape, 1,
            int(num_classes), interp)
        pending.append(_argmax0_uint8(logits))
    return [np.asarray(p)[:s[0], :s[1], :s[2]]
            for p, s in zip(pending, shapes)]


@partial(jax.jit, static_argnames=("model_fn", "patch_size", "out_shape",
                                   "sep", "num_classes", "interpret"))
def _sliding_window_scan_dual_aligned(model_fn: Callable, params,
                                      data: jnp.ndarray,
                                      starts: jnp.ndarray,
                                      g_lr: jnp.ndarray, g_hr: jnp.ndarray,
                                      patch_size: tuple, out_shape: tuple,
                                      sep: int, num_classes: int,
                                      interpret: bool):
    """Aligned-grid DUAL tile loop with the fused Pallas accumulate kernel
    on both heads. model_fn(params, batch) returns (lr_planes, hr_planes)
    per-class planes for a z-grouped mirror batch. Returns uint8
    (lr_labels, hr_labels) ON DEVICE (the serving predictor fetches them;
    bench.py consumes them device-side)."""
    from ..ops.pallas_tail import accumulate_tta_tile

    pd, ph, pw = patch_size
    llr0 = jnp.zeros((num_classes, *out_shape), jnp.float32)
    lhr0 = jnp.zeros((num_classes, out_shape[0] * sep, out_shape[1],
                      out_shape[2]), jnp.float32)

    def tile_step(carry, start):
        llr, lhr = carry
        tile = lax.dynamic_slice(
            data, (start[0], start[1], start[2], 0),
            (pd, ph, pw, data.shape[-1]))
        batch = _mirror_batch_zgrouped(tile)
        p_lr, p_hr = model_fn(params, batch)
        llr = accumulate_tta_tile(llr, p_lr, g_lr, start, z_scale=1,
                                  interpret=interpret)
        lhr = accumulate_tta_tile(lhr, p_hr, g_hr, start, z_scale=sep,
                                  interpret=interpret)
        return (llr, lhr), None

    (llr, lhr), _ = lax.scan(tile_step, (llr0, lhr0), starts)
    return (jnp.argmax(llr, 0).astype(jnp.uint8),
            jnp.argmax(lhr, 0).astype(jnp.uint8))


def predict_sliding_window_dual_labels_aligned(
        model_fn: Callable, params, data: np.ndarray, patch_size,
        *, slice_separation: int, tile_step_size: float = 0.5,
        use_gaussian: bool = True, num_classes: int = 2,
        input_dtype=jnp.bfloat16, interpret: bool | None = None):
    """One-pass aligned-grid LR+HR prediction with the fused kernel on both
    heads. model_fn returns (lr_planes, hr_planes). Returns
    (lr_labels, hr_labels) uint8 cropped to the input size."""
    d0, h0, w0 = data.shape[:3]
    sep = int(slice_separation)
    dev, starts, g_hr, patch_size, shape, interp = _aligned_prep(
        data, patch_size, tile_step_size, use_gaussian, sep, input_dtype,
        interpret)
    g_lr = _device_gaussian(patch_size, bool(use_gaussian))
    lab_lr, lab_hr = _sliding_window_scan_dual_aligned(
        model_fn, params, dev, starts, g_lr, g_hr, patch_size, shape,
        sep, int(num_classes), interp)
    return (np.asarray(lab_lr)[:d0, :h0, :w0],
            np.asarray(lab_hr)[:d0 * sep, :h0, :w0])


def evaluate_case_volume(model_fn: Callable, params, volume: np.ndarray,
                         label: np.ndarray | None, patch_size,
                         *, slice_separation: int = 1,
                         hr_model_fn: Callable | None = None,
                         dual_model_fn: Callable | None = None,
                         tile_step_size: float = 0.5,
                         mirror: bool = True, num_classes: int = 2):
    """Sliding-window evaluation of one (D, H, W) volume.

    Mirrors ``evaluate_case`` (seg_utils.py:736-784): zscore-normalized input
    is padded to >= patch, LR logits predicted with gaussian weighting +
    mirror TTA, padding reverted, softmax/argmax to a LR mask, optional
    second HR pass with the z-upscaled head.

    Returns (pred_lr, pred_hr, dice_lr).
    """
    from ..losses import calculate_dice
    from .. import data as _data_mod  # noqa: F401

    from ..data.normalize import zscore_normalization

    vol = zscore_normalization(volume)[..., None]  # (D, H, W, 1)
    target_shape = [max(s, p) for s, p in zip(vol.shape[:3], patch_size)]
    vol_p, pads = target_pad(vol, target_shape + [1], mode="constant")

    if dual_model_fn is not None:
        # one-pass LR+HR: both heads share the encoder/decoder compute
        pred_lr_full, pred_hr_full = predict_sliding_window_dual_labels(
            dual_model_fn, params, vol_p, patch_size,
            slice_separation=slice_separation, tile_step_size=tile_step_size,
            use_gaussian=True, mirror=mirror, num_classes=num_classes)
        pred_lr = crop(pred_lr_full, pads[:3])
        hr_pads = ((pads[0][0] * slice_separation,
                    pads[0][1] * slice_separation),) + pads[1:3]
        pred_hr = crop(pred_hr_full, hr_pads)
        dice_lr = (calculate_dice(pred_lr, label.astype(np.uint8))
                   if label is not None else None)
        return pred_lr, pred_hr, dice_lr

    pred_full = predict_sliding_window_labels(
        model_fn, params, vol_p, patch_size,
        slice_separation=1, tile_step_size=tile_step_size,
        use_gaussian=True, mirror=mirror, num_classes=num_classes)
    pred_lr = crop(pred_full, pads[:3])

    dice_lr = None
    if label is not None:
        dice_lr = calculate_dice(pred_lr, label.astype(np.uint8))

    pred_hr = pred_lr
    if hr_model_fn is not None:
        pred_hr_full = predict_sliding_window_labels(
            hr_model_fn, params, vol_p, patch_size,
            slice_separation=slice_separation, tile_step_size=tile_step_size,
            use_gaussian=True, mirror=mirror, num_classes=num_classes)
        hr_pads = ((pads[0][0] * slice_separation,
                    pads[0][1] * slice_separation),) + pads[1:3]
        pred_hr = crop(pred_hr_full, hr_pads)

    return pred_lr, pred_hr, dice_lr
