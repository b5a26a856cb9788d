"""SR volume inference + postprocessing (stage-1 pseudo-HR generation).

Capability parity with the reference sr_utils
(/root/reference/utils/sr_utils.py:20-304):

  infer_wdsr_volume:  slide the 2D WDSR over in-plane slices, upsampling the
    thin z axis (the reference achieves the same net axis routing through its
    lr_axis=0 + rot90 + permute chain, sr_utils.py:33-73). All slices batch
    into device-sized chunks instead of the reference's batch=1 loop.

  infer_flavr_volume: 4-slice sliding window along z (zero-padded ends,
    sr_utils.py:115-125); every window position folds into ONE batched
    forward (the reference runs one forward per LR slice gap). H/W pad to
    multiples of 16 for the encoder strides. Output has 4*(Z-1) slices — the
    reference's concatenation semantics (sr_utils.py:133).

  postprocess_smore / postprocess_flavr: slice-profile re-blur of the SR
    volumes to produce stage-2 training inputs (sr_utils.py:244-304),
    including the cubic/nearest zoom fallback when SMORE is disabled.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.blur import parse_kernel, blur_axis_np
from ..ops.bspline import zoom_axis_np
from ..utils.patch import find_integer_p, calc_slices_to_crop
from ..io.volume import inv_normalize


def _pad_z_for_rational_sr(vol: np.ndarray, slice_separation: float):
    """Reflect-pad z so the rational SR factor lands on the ideal slice count
    (sr_utils.py:46-48). vol: (..., z, c) with z at axis -2."""
    n = vol.shape[-2]
    n_pad = find_integer_p(n, slice_separation)
    n_crop = calc_slices_to_crop(n_pad, slice_separation)
    if n_pad:
        pads = [(0, 0)] * vol.ndim
        pads[-2] = (0, n_pad)
        vol = np.pad(vol, pads, mode="reflect")
    return vol, n_crop


from ..utils.cache import BoundedCache

_FWD_CACHE: BoundedCache = BoundedCache(maxsize=8)


def _cached_forward(model, out_index=None):
    """Jitted model forward cached per (model identity, output index) so
    per-subject inference over many volumes reuses one compiled program.
    The entry pins the model object so a GC'd model's id can never alias a
    new model onto a stale compiled forward; LRU-bounded so long-lived
    processes don't pin compiled programs forever."""
    key = (id(model), out_index)
    if key not in _FWD_CACHE:
        def fwd(p, b):
            out = model.apply(p, b)
            if isinstance(out, tuple) and out_index is not None:
                out = out[out_index]
            return out
        _FWD_CACHE[key] = (model, jax.jit(fwd))
    return _FWD_CACHE[key][1]


def infer_wdsr_volume(model, params, volume: np.ndarray,
                      slice_separation: float, batch: int = 8) -> np.ndarray:
    """volume: (x, y, z, c) with thin z. Returns (x, y, z*sep, c).

    Each x-slice is a (z, y, c) image; WDSR upsamples its first axis.
    """
    vol, n_crop = _pad_z_for_rational_sr(volume, slice_separation)
    x_slices = vol.transpose(0, 2, 1, 3)  # (x, z, y, c)
    nx = x_slices.shape[0]
    pad_n = (-nx) % batch
    if pad_n:
        x_slices = np.concatenate(
            [x_slices, np.zeros((pad_n, *x_slices.shape[1:]),
                                x_slices.dtype)], axis=0)

    fwd = _cached_forward(model)
    outs = []
    for st in range(0, x_slices.shape[0], batch):
        outs.append(np.asarray(fwd(params,
                                   jnp.asarray(x_slices[st:st + batch]))))
    out = np.concatenate(outs, axis=0)[:nx]  # (x, z*sep, y, c)
    if n_crop:
        out = out[:, :-n_crop]
    return out.transpose(0, 2, 1, 3)  # (x, y, z*sep, c)


def flavr_windows(vol_zhw: np.ndarray) -> np.ndarray:
    """(z, H, W, C) -> (z-1, 4, H, W, C) zero-padded 4-slice windows
    (sr_utils.py:115-125)."""
    z = vol_zhw.shape[0]
    padded = np.concatenate([
        np.zeros((1, *vol_zhw.shape[1:]), vol_zhw.dtype), vol_zhw,
        np.zeros((1, *vol_zhw.shape[1:]), vol_zhw.dtype)], axis=0)
    idx = np.arange(z - 1)[:, None] + np.arange(4)[None]
    return padded[idx]


_VOL_FWD_CACHE: BoundedCache = BoundedCache(maxsize=8)


def _cached_volume_forward(model, out_index: int, batch: int,
                           compute_dtype=None):
    """Jitted DEVICE-RESIDENT volume inference: the (z, H, W, C) volume
    uploads once; z-windowing (a gather), every 4-slice forward (lax.map
    over window chunks), and the slice concat all run inside ONE jit. The
    host-loop variant in infer_flavr_volume re-uploads each window (the
    windows overlap 4x, so it ships 4x the volume over PCIe/tunnel);
    this is the TPU-first path — same math, pinned by
    tests/test_sr_axis_golden.py::test_flavr_device_volume_parity."""
    key = (id(model), out_index, batch, compute_dtype)
    if key not in _VOL_FWD_CACHE:
        def vol_fwd(p, vol_zhw):  # (z, H, W, c) -> (4*(z-1), H, W, c_out)
            z = vol_zhw.shape[0]
            if compute_dtype is not None:
                # unconditional cast (not Policy.cast_compute, whose fp32
                # identity short-circuit would skip downcasting bf16 params
                # when a caller explicitly requests the fp32 path)
                vol_zhw = vol_zhw.astype(compute_dtype)
                p = jax.tree.map(
                    lambda t: t.astype(compute_dtype)
                    if jnp.issubdtype(t.dtype, jnp.inexact) else t, p)
            padded = jnp.pad(vol_zhw, ((1, 1), (0, 0), (0, 0), (0, 0)))
            idx = np.arange(z - 1)[:, None] + np.arange(4)[None]
            windows = padded[idx]  # (z-1, 4, H, W, c)
            nw = z - 1
            pad_n = (-nw) % batch
            if pad_n:
                windows = jnp.concatenate(
                    [windows,
                     jnp.zeros((pad_n, *windows.shape[1:]), windows.dtype)])
            chunks = windows.reshape(-1, batch, *windows.shape[1:])

            def one(chunk):
                out = model.apply(p, chunk)
                if isinstance(out, tuple):
                    out = out[out_index]
                return out

            outs = jax.lax.map(one, chunks)
            out = outs.reshape(-1, *outs.shape[2:])[:nw]  # (z-1,4,H,W,co)
            return out.reshape(4 * nw, *out.shape[2:])

        _VOL_FWD_CACHE[key] = (model, jax.jit(vol_fwd))
    return _VOL_FWD_CACHE[key][1]


def _dispatch_volume_forward(model, params, vol_zhw, x, y, z, n_crop,
                             out_index, batch, compute_dtype):
    """Dispatch the device-resident volume forward (async — returns as
    soon as the computation is enqueued) and return (pending, finalize);
    finalize() fetches and postprocesses to the (x, y, z_out, c_out)
    layout infer_flavr_volume returns."""
    fwd = _cached_volume_forward(model, out_index, batch, compute_dtype)
    pending = fwd(params, jnp.asarray(vol_zhw))

    def finalize():
        out = np.asarray(pending)
        if out.dtype != np.float32:
            # bf16 compute: fetch stays half-size; widen on host for the
            # numpy postprocessing/NIfTI chain
            out = out.astype(np.float32)
        out = out.reshape(z - 1, 4, *out.shape[1:])
        out = out[:, :, :x, :y]              # strip the x16 padding
        zo = out.shape[0] * out.shape[1]
        out = out.reshape(zo, x, y, out.shape[-1])
        if n_crop:
            out = out[:-n_crop]
        return out.transpose(1, 2, 0, 3)     # (x, y, z_out, c_out)

    return pending, finalize


def infer_flavr_volume_async(model, params, volume: np.ndarray,
                             slice_separation: float,
                             out_index: int | None = None, batch: int = 8,
                             compute_dtype=None):
    """Async variant of infer_flavr_volume (device path only): dispatches
    the forward and returns finalize() -> (x, y, z_out, c_out). The caller
    overlaps this subject's device compute with the previous subject's
    fetch/write and the next subject's host prep — pipeline stage-1c runs
    a 1-deep software pipeline over subjects (the reference runs each
    volume start-to-finish serially, sr_utils.py:98-175)."""
    vol, n_crop = _pad_z_for_rational_sr(volume, slice_separation)
    x, y, z, c = vol.shape
    vol_zhw = vol.transpose(2, 0, 1, 3)
    pad_h = (-x) % 16
    pad_w = (-y) % 16
    if pad_h or pad_w:
        vol_zhw = np.pad(vol_zhw, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    _, finalize = _dispatch_volume_forward(
        model, params, vol_zhw, x, y, z, n_crop,
        out_index if out_index is not None else 0, batch, compute_dtype)
    return finalize


def infer_flavr_volume(model, params, volume: np.ndarray,
                       slice_separation: float, out_index: int | None = None,
                       batch: int = 8, device: bool = True,
                       compute_dtype=None) -> np.ndarray:
    """volume: (x, y, z, c). Returns (x, y, 4*(z_pad-1), c_out) where c_out
    follows the selected model output (0 = SR image+label, 1 = uncertainty).

    The z-windows batch through the model in chunks; H/W are zero-padded to
    multiples of 16 for the encoder strides (sr_utils.py:106-113).

    device=True (default) runs windowing + all forwards device-resident in
    one jit (volume uploads once); device=False is the host-loop oracle
    (identical output, 4x the upload traffic).

    compute_dtype: cast params + volume for the forward (e.g. jnp.bfloat16
    for serving/bench throughput); None keeps the params' dtype (fp32
    reference parity).
    """
    vol, n_crop = _pad_z_for_rational_sr(volume, slice_separation)
    x, y, z, c = vol.shape
    vol_zhw = vol.transpose(2, 0, 1, 3)  # (z, H=x, W=y, c)

    pad_h = (-x) % 16
    pad_w = (-y) % 16
    if pad_h or pad_w:
        vol_zhw = np.pad(vol_zhw, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    if device:
        _, finalize = _dispatch_volume_forward(
            model, params, vol_zhw, x, y, z, n_crop,
            out_index if out_index is not None else 0, batch,
            compute_dtype)
        return finalize()
    else:
        windows = flavr_windows(vol_zhw)  # (z-1, 4, H, W, c)
        nw = windows.shape[0]
        pad_n = (-nw) % batch
        if pad_n:
            windows = np.concatenate(
                [windows,
                 np.zeros((pad_n, *windows.shape[1:]), windows.dtype)],
                axis=0)

        fwd = _cached_forward(model, out_index if out_index is not None
                              else 0)
        outs = []
        for st in range(0, windows.shape[0], batch):
            outs.append(np.asarray(
                fwd(params, jnp.asarray(windows[st:st + batch]))))
        out = np.concatenate(outs, axis=0)[:nw]  # (z-1, 4, H, W, c_out)
    out = out[:, :, :x, :y]                  # strip the x16 padding
    zo = out.shape[0] * out.shape[1]
    out = out.reshape(zo, x, y, out.shape[-1])
    if n_crop:
        out = out[:-n_crop]
    return out.transpose(1, 2, 0, 3)  # (x, y, z_out, c_out)


def postprocess_sr_volume(image_xyz: np.ndarray, blur_fwhm: float,
                          blur_kernel_name: str = "rf-pulse-slr"):
    """Slice-profile re-blur along x and y of the pseudo-HR image
    (sr_utils.py:267-277): the blurred copies are the stage-1 training LR
    sources."""
    kernel = parse_kernel(None, blur_kernel_name, blur_fwhm)
    # (x, y, z[, c]) -> (z, c, x, y)
    img = image_xyz if image_xyz.ndim == 4 else image_xyz[..., None]
    zcxy = img.transpose(2, 3, 0, 1)[:, 0:1]
    image_x_rgb = blur_axis_np(zcxy.astype(np.float32), kernel, axis=2)
    zcyx = img.transpose(2, 3, 1, 0)[:, 0:1]
    image_y_rgb = blur_axis_np(zcyx.astype(np.float32), kernel, axis=2)
    return image_x_rgb, image_y_rgb


def interpolate_pseudo_sr(image: np.ndarray, label: np.ndarray,
                          slice_separation: float):
    """Traditional-interpolation fallback (no SMORE): cubic zoom for image,
    nearest for label, along z (sr_utils.py:256-265)."""
    up_img = zoom_axis_np(image, slice_separation, axis=2, order=3)
    up_lab = zoom_axis_np(label, slice_separation, axis=2, order=0)
    return up_img, up_lab


def zeroonenorm255(data: np.ndarray) -> np.ndarray:
    """(x - min)/(max - min) * 255 (sr_utils.py:279-282)."""
    data = (data - np.min(data)) / (np.max(data) - np.min(data))
    return data * 255.0


def restore_intensity(out01: np.ndarray, orig_min, orig_max) -> np.ndarray:
    """Map model [0,1] outputs back to the source intensity range
    (sr_utils.py:175, inv_normalize with a=0, b=1)."""
    return inv_normalize(out01, orig_min, orig_max, a=0, b=1)
