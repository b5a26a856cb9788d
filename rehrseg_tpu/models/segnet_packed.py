"""Space-to-depth packed SegModel forward for the sliding-window eval path.

Consumes STANDARD SegModel parameters (models.segnet) and computes the
mathematically identical forward with the high-resolution low-channel stages
in packed 2x2 layout (ops.pack2d) — C=32/64 becomes 128/256 lanes, which is
what the MXU wants (measured 3.6 -> 18-80 TFLOP/s per conv on v5e-lite; see
docs/BENCHMARKS.md round 2 and experiments/conv_micro*.py). Additionally all
(1, 3, 3) convs fold D into the batch and run as 2D convs, which alone is
~5x on XLA's TPU emitter.

This is a pure layout transform — tests/test_packed_segmodel.py pins
exactness against SegModel.apply to float tolerance, and the sliding-window
engine treats it as a drop-in model_fn.

Reference hot path being accelerated: nnUNet-style PlainConvUNet eval
(seg_utils.py:240-287 / seg_model.py:153-210).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pack2d import (
    space_to_depth_hw, depth_to_space_hw, offset_pack_hw, aligned_to_offset_hw,
    pack_conv_weights, pack_transpconv_weights, pack_bias,
    conv_packed, pointwise_packed_transpconv, instance_norm_packed,
)


def _to3(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def _instance_norm(x, scale, bias, eps):
    spatial = tuple(range(1, x.ndim - 1))
    m = jnp.mean(x, axis=spatial, keepdims=True)
    v = jnp.var(x, axis=spatial, keepdims=True)
    y = (x - m) * lax.rsqrt(v + eps)
    if scale is not None:
        y = y * scale + bias
    return y


def _conv_std(x, w, b, strides):
    pad = tuple((k // 2, k // 2) for k in w.shape[:3])
    y = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    return y + b if b is not None else y


def _transpconv_std(x, wt, b, strides):
    pads = tuple((k - 1, k - 1) for k in wt.shape[:3])
    y = lax.conv_transpose(
        x, wt, strides=strides, padding=pads, transpose_kernel=True,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b if b is not None else y


def _packable(kernel, h, w, feats, pack_max_channels):
    return (feats <= pack_max_channels and kernel[1] == 3 and kernel[2] == 3
            and h % 2 == 0 and w % 2 == 0)


def _to_offset(x, packed):
    return aligned_to_offset_hw(x) if packed else offset_pack_hw(x)


def _conv_norm_act(x, packed, cp, kernel, stride, feats, a, *,
                   pack_max_channels, in_splits=None, pre_offset=None):
    """One ConvNormAct in packed or standard layout.

    Returns (y, y_packed). ``pre_offset``: already-offset-packed input (the
    decoder concat path builds it per-tensor)."""
    w = cp["conv"]["kernel"]
    b = cp["conv"].get("bias")
    scale = cp["norm"]["scale"] if a["norm_affine"] else None
    nbias = cp["norm"]["bias"] if a["norm_affine"] else None
    eps, slope = a["norm_eps"], a["nonlin_slope"]

    if pre_offset is not None:
        h, wd = (pre_offset.shape[2] - 1) * 2, (pre_offset.shape[3] - 1) * 2
    else:
        h, wd = (x.shape[2] * (2 if packed else 1),
                 x.shape[3] * (2 if packed else 1))
    strided = stride[1] == 2 and stride[2] == 2

    if _packable(kernel, h, wd, feats, pack_max_channels):
        xo = pre_offset if pre_offset is not None else _to_offset(x, packed)
        if strided:
            wp = pack_conv_weights(w, in_splits=in_splits, packed_out=False)
            y = conv_packed(xo, wp, b, d_stride=stride[0])
            y = _leaky(_instance_norm(y, scale, nbias, eps), slope)
            return y, False
        wp = pack_conv_weights(w, in_splits=in_splits, packed_out=True)
        y = conv_packed(xo, wp, pack_bias(b) if b is not None else None)
        y = _leaky(instance_norm_packed(y, scale, nbias, eps), slope)
        return y, True

    if packed:
        x = depth_to_space_hw(x)
    elif pre_offset is not None:
        raise AssertionError("standard path cannot consume offset input")
    y = _conv_std(x, w, b, stride)
    y = _leaky(_instance_norm(y, scale, nbias, eps), slope)
    return y, False


def segmodel_apply_packed(arch: dict, params, x, *, num_classes: int = 2,
                          upscale: int = 4, pack_max_channels: int = 64,
                          dual: bool = False,
                          sr_packed: bool = True):
    """Forward identical to SegModel.apply (models/segnet.py:176-186) with
    packed high-res stages. Returns lr_logits, or (lr_logits, hr_logits)
    when ``dual``."""
    a = dict(arch)
    n = a["n_stages"]
    feats = a["features_per_stage"]
    kernels = [_to3(k) for k in a["kernel_sizes"]]
    strides = [_to3(s) for s in a["strides"]]
    p = params["params"]
    penc, pdec = p["encoder"], p["decoder"]

    # ---------------- encoder
    cur, packed = x, False
    skips = []  # (tensor, packed)
    for s in range(n):
        sp = penc[f"stage_{s}"]
        for i in range(a["n_conv_per_stage"][s]):
            st = strides[s] if i == 0 else (1, 1, 1)
            cur, packed = _conv_norm_act(
                cur, packed, sp[f"conv_{i}"], kernels[s], st, feats[s], a,
                pack_max_channels=pack_max_channels)
        skips.append((cur, packed))

    # ---------------- decoder
    lres, lres_packed = skips[-1]
    seg_logits = None
    features = None
    for s in range(n - 1):
        ridx = n - 2 - s
        stride = strides[n - 1 - s]
        out_ch = feats[ridx]
        wt = pdec[f"transpconv_{s}"]["kernel"]
        bt = pdec[f"transpconv_{s}"].get("bias")
        skip, skip_packed = skips[ridx]

        h_t = skip.shape[2] * (2 if skip_packed else 1)
        w_t = skip.shape[3] * (2 if skip_packed else 1)
        pack_here = (_packable(kernels[ridx], h_t, w_t, out_ch,
                               pack_max_channels)
                     and stride[1] == 2 and stride[2] == 2)

        if lres_packed:
            lres = depth_to_space_hw(lres)
            lres_packed = False

        if pack_here:
            up = pointwise_packed_transpconv(
                lres, pack_transpconv_weights(wt),
                pack_bias(bt) if bt is not None else None)
            skip_p = skip if skip_packed else space_to_depth_hw(skip)
            xo = jnp.concatenate([aligned_to_offset_hw(up),
                                  aligned_to_offset_hw(skip_p)], axis=-1)
            cur, packed = None, True
            sp = pdec[f"stage_{s}"]
            for i in range(a["n_conv_per_stage_decoder"][s]):
                if i == 0:
                    cur, packed = _conv_norm_act(
                        None, True, sp[f"conv_{i}"], kernels[ridx],
                        (1, 1, 1), out_ch, a,
                        pack_max_channels=pack_max_channels,
                        in_splits=[out_ch, skip.shape[-1] //
                                   (4 if skip_packed else 1)],
                        pre_offset=xo)
                else:
                    cur, packed = _conv_norm_act(
                        cur, packed, sp[f"conv_{i}"], kernels[ridx],
                        (1, 1, 1), out_ch, a,
                        pack_max_channels=pack_max_channels)
        else:
            up = _transpconv_std(lres, wt, bt, stride)
            if skip_packed:
                skip = depth_to_space_hw(skip)
            cur, packed = jnp.concatenate([up, skip], axis=-1), False
            sp = pdec[f"stage_{s}"]
            for i in range(a["n_conv_per_stage_decoder"][s]):
                cur, packed = _conv_norm_act(
                    cur, packed, sp[f"conv_{i}"], kernels[ridx], (1, 1, 1),
                    out_ch, a, pack_max_channels=pack_max_channels)

        if s == n - 2:
            features = depth_to_space_hw(cur) if packed else cur
            wseg = pdec[f"seg_layer_{s}"]["kernel"]
            bseg = pdec[f"seg_layer_{s}"]["bias"]
            seg_logits = _conv_std(features, wseg, bseg, (1, 1, 1))
        lres, lres_packed = cur, packed

    if not dual:
        return seg_logits

    from ..ops.bspline import upsample_axis_linear

    up = upsample_axis_linear(features, upscale, axis=1, align_corners=True)
    if sr_packed and up.shape[2] % 2 == 0 and up.shape[3] % 2 == 0:
        # SR head runs at upscale*D full resolution with C=32/16 — pack it
        # too; the 5x5 conv spans 3x3 packed cells (pack2d handles 3x3
        # kernels only, so do 5x5 via two stacked passes? No: fall back to
        # unpacked 2D fold for the 5x5)
        w1, b1 = p["sr_head_conv1"]["kernel"], p["sr_head_conv1"]["bias"]
        h1 = jax.nn.relu(_conv_std(up, w1, b1, (1, 1, 1)))
        w2, b2 = p["sr_head_conv2"]["kernel"], p["sr_head_conv2"]["bias"]
        hr = _conv_std(h1, w2, b2, (1, 1, 1))
    else:
        w1, b1 = p["sr_head_conv1"]["kernel"], p["sr_head_conv1"]["bias"]
        h1 = jax.nn.relu(_conv_std(up, w1, b1, (1, 1, 1)))
        w2, b2 = p["sr_head_conv2"]["kernel"], p["sr_head_conv2"]["bias"]
        hr = _conv_std(h1, w2, b2, (1, 1, 1))
    return seg_logits, hr
