"""Device-side (jitted, batched) nnUNet-style augmentation.

The reference augments on the host through batchgenerators/scipy — order-3
map_coordinates per channel costs ~0.4 s/sample on one CPU core, starving
the TPU (the training step is ~100x faster). This module runs the same
augmentation distribution ON DEVICE, vectorized over the batch:

  spatial (dummy-2D): per-sample in-plane rotation (+-pi, p=0.2) and scaling
    (0.7-1.4, p=0.2), one shared coordinate mesh for data (order-3 B-spline,
    ops/warp.py) and every label key (order-1 + threshold), uncertainty as
    continuous data — matching seg_utils.py:374-509 semantics;
  intensity chain on the data key: GaussianNoise(p=.1, std~U(0,.1)),
    GaussianBlur(sigma U(.5,1), p=.2), BrightnessMultiplicative(.75-1.25,
    p=.15), Contrast(.75-1.25 preserve-range, p=.15),
    SimulateLowResolution(p=.25, zoom quantized to a static set, composed
    nearest-down + cubic-up as precomputed matrices — exact scipy.zoom
    numerics per factor), Gamma(invert, p=.1) and Gamma(p=.3) with retained
    stats.

Known deliberate deviations from the host path (documented): B-spline warp
uses mirror boundary inside the volume + constant masking outside (scipy
'constant' spline tails differ slightly near borders); SimulateLowRes zoom
factors are quantized to `_ZOOM_FACTORS` instead of continuous.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import warp as W

_ZOOM_FACTORS = (0.5, 0.6, 0.7, 0.8, 0.9, 1.0)


@lru_cache(maxsize=32)
def _lowres_matrices(n: int) -> np.ndarray:
    """(K, n, n) composed nearest-down->cubic-up matrices, exact
    scipy.ndimage.zoom numerics per quantized factor."""
    from scipy.ndimage import zoom
    mats = []
    eye = np.eye(n, dtype=np.float64)
    for f in _ZOOM_FACTORS:
        target = max(int(round(n * f)), 1)
        M = np.zeros((n, n))
        for k in range(n):
            down = zoom(eye[k], target / n, order=0)
            M[:, k] = zoom(down, n / len(down), order=3)[:n]
        mats.append(M)
    return np.stack(mats).astype(np.float32)


def _gauss_kernel(sigma, radius: int = 4):
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (d / sigma) ** 2)
    return k / k.sum()


def _blur3(x, sigma):
    """Separable 3D gaussian blur of (z, y, x) with traced sigma."""
    k = _gauss_kernel(sigma)
    for axis in range(3):
        moved = jnp.moveaxis(x, axis, -1)
        pad = 4
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(pad, pad)],
                         mode="symmetric")  # scipy gaussian_filter default
                         # 'reflect' = (d c b a | a b c d) = numpy symmetric
        windows = jnp.stack([padded[..., i:i + moved.shape[-1]]
                             for i in range(2 * pad + 1)], axis=-1)
        moved = jnp.einsum("...w,w->...", windows, k)
        x = jnp.moveaxis(moved, -1, axis)
    return x


def _spatial_one(key, data, segs, cont, patch_hw):
    """One sample: data (z, Y, X), segs list of (zs, Y, X) binary, cont list
    of (z, Y, X) continuous. Returns warped arrays at patch_hw."""
    kr, ks, ka, kc = jax.random.split(key, 4)
    do_rot = jax.random.uniform(kr) < 0.2
    do_scale = jax.random.uniform(ks) < 0.2
    angle = jnp.where(do_rot, jax.random.uniform(ka, minval=-jnp.pi,
                                                 maxval=jnp.pi), 0.0)
    k1, k2, k3 = jax.random.split(kc, 3)
    low = jnp.where(jax.random.uniform(k1) < 0.5,
                    jax.random.uniform(k2, minval=0.7, maxval=1.0),
                    jax.random.uniform(k3, minval=1.0, maxval=1.4))
    scale = jnp.where(do_scale, low, 1.0)

    in_shape = data.shape[-2:]
    coords, mask = W.rotate_scale_coords(patch_hw, angle, scale, in_shape)

    def warp_stack(vol, seg_mode):
        fn = (lambda im: W.warp_seg_2d(im, coords, mask)) if seg_mode else \
             (lambda im: W.warp_data_2d(im, coords, mask))
        return jax.vmap(fn)(vol)

    out_data = warp_stack(data, False)
    out_segs = [warp_stack(s, True) for s in segs]
    out_cont = [warp_stack(c, False) for c in cont]
    return out_data, out_segs, out_cont


def _intensity_one(key, data):
    """Intensity chain on one sample's data (z, Y, X)."""
    keys = jax.random.split(key, 13)

    # GaussianNoise p=0.1 (batchgenerators uses the sampled variance as std)
    std = jax.random.uniform(keys[1], minval=0.0, maxval=0.1)
    noise = jax.random.normal(keys[2], data.shape) * std
    data = jnp.where(jax.random.uniform(keys[0]) < 0.1, data + noise, data)

    # GaussianBlur p=0.2, p_per_channel=0.5 (single channel here)
    sigma = jax.random.uniform(keys[4], minval=0.5, maxval=1.0)
    do_blur = (jax.random.uniform(keys[3]) < 0.2) & \
              (jax.random.uniform(keys[5]) < 0.5)
    data = jnp.where(do_blur, _blur3(data, sigma), data)

    # BrightnessMultiplicative p=0.15
    mult = jax.random.uniform(keys[7], minval=0.75, maxval=1.25)
    data = jnp.where(jax.random.uniform(keys[6]) < 0.15, data * mult, data)

    # Contrast p=0.15 (preserve range)
    factor = jax.random.uniform(keys[9], minval=0.75, maxval=1.25)
    mn = data.mean()
    contrasted = jnp.clip((data - mn) * factor + mn, data.min(), data.max())
    data = jnp.where(jax.random.uniform(keys[8]) < 0.15, contrasted, data)

    # SimulateLowResolution p_per_sample=0.25 x p_per_channel=0.5
    # (in-plane only; ignore_axes=(0,) = z). batchgenerators draws ONE
    # scalar zoom per channel for all non-ignored axes, so y and x share
    # the same quantized factor index deliberately.
    mats_y = jnp.asarray(_lowres_matrices(data.shape[1]))
    mats_x = jnp.asarray(_lowres_matrices(data.shape[2]))
    kf = jax.random.randint(keys[10], (), 0, len(_ZOOM_FACTORS))
    low = jnp.einsum("zyx,Yy->zYx", data, mats_y[kf])
    low = jnp.einsum("zYx,Xx->zYX", low, mats_x[kf])
    do_lr = (jax.random.uniform(keys[11]) < 0.25) & \
            (jax.random.uniform(keys[12]) < 0.5)
    data = jnp.where(do_lr, low, data)
    return data


def _gamma_one(key, data, invert: bool, p: float):
    k0, k1, k2, k3 = jax.random.split(key, 4)
    x = -data if invert else data
    mn_s, sd_s = x.mean(), x.std()
    gamma = jnp.where(jax.random.uniform(k1) < 0.5,
                      jax.random.uniform(k2, minval=0.7, maxval=1.0),
                      jax.random.uniform(k3, minval=1.0, maxval=1.5))
    minm = x.min()
    rnge = x.max() - minm
    y = jnp.power((x - minm) / (rnge + 1e-7), gamma) * rnge + minm
    # retain stats
    y = (y - y.mean()) / (y.std() + 1e-8) * sd_s + mn_s
    y = -y if invert else y
    out = jnp.where(jax.random.uniform(k0) < p, y, data)
    return out


def augment_seg_batch(key, img, label_lr, label_hr, uncertainty,
                      patch_hw, enable_uncertainty: bool = True):
    """Batched device augmentation for stage-2 training.

    img/label_lr/uncertainty: (B, z, Y, X, 1); label_hr: (B, z*sep, Y, X, 1).
    Returns the same dict cropped in-plane to patch_hw. Jit this (static
    patch_hw) and feed raw crops from the host.
    """
    b = img.shape[0]
    keys = jax.random.split(key, b * 3).reshape(b, 3)

    def one(sample_keys, im, llr, lhr, unc):
        im = im[..., 0]
        llr = llr[..., 0]
        lhr = lhr[..., 0]
        unc = unc[..., 0]
        cont = [unc] if enable_uncertainty else []
        segs = [llr, lhr]
        im2, segs2, cont2 = _spatial_one(sample_keys[0], im, segs, cont,
                                         patch_hw)
        im2 = _intensity_one(sample_keys[1], im2)
        kg1, kg2 = jax.random.split(sample_keys[2])
        im2 = _gamma_one(kg1, im2, invert=True, p=0.1)
        im2 = _gamma_one(kg2, im2, invert=False, p=0.3)
        unc2 = cont2[0] if enable_uncertainty else jnp.zeros_like(segs2[0])
        return (im2[..., None], segs2[0][..., None], segs2[1][..., None],
                unc2[..., None])

    return jax.vmap(one)(keys, img, label_lr, label_hr, uncertainty)


def augment_sr_hr_batch(key, hr):
    """Batched device intensity augmentation for stage-1 SR training.

    The reference stage-1 transform is intensity-ONLY on the HR image
    (train_set.py:259-277 passes enable_spatial=False; 'seg' and 'img_lr'
    ride through as label keys), so the device port touches just channel 0
    of the HR target: the full nnUNet intensity chain + the two gamma
    stages. hr: (B, D, H, W, C>=1); label channels return untouched.

    Same distribution as the host TrainingTransforms path (which remains
    the parity oracle, nnunet_transform=True without device_augment_sr);
    per-sample streams come from the JAX key, not the numpy Generator.
    """
    def one(sample_key, sample):
        k0, k1, k2 = jax.random.split(sample_key, 3)
        im = sample[..., 0]
        im = _intensity_one(k0, im)
        im = _gamma_one(k1, im, invert=True, p=0.1)
        im = _gamma_one(k2, im, invert=False, p=0.3)
        return jnp.concatenate([im[..., None], sample[..., 1:]], axis=-1)

    keys = jax.random.split(key, hr.shape[0])
    return jax.vmap(one)(keys, hr)
