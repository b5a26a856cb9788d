"""Space-to-depth (2x2 in-plane) packing for the sliding-window eval path.

WHY: TPU vector lanes are 128-wide on the channel axis. The nnUNet-style
SegModel spends most of its FLOPs in C=32/64 convs at high resolution
(encoder stage 0/1 + the last two decoder stages); XLA's conv emitter runs
those at 3-22 TFLOP/s on this chip while the same math packed to C>=128
runs at 65-88 TFLOP/s (measured, experiments/conv_micro*.py), and C=32
activations waste 4x HBM on lane padding (the round-1 OOM at TTA batch 16).

HOW (exact math, not an approximation): pack 2x2 in-plane pixel blocks into
channels (C -> 4C at half resolution, channel order (dy, dx, c)). Then:

  - a SAME (1,3,3)/(3,3,3) stride-1 conv == a VALID (1,2,2)/(3,2,2) conv on
    the OFFSET-packed input (cells shifted by one pixel up-left so the 3x3
    receptive field of each output 2x2 block covers exactly 2x2 input
    cells), with weights W'[s,t,(dy',dx',ci),(dy,dx,co)] = W[u+1,v+1,ci,co]
    where u = 2s-1+dy'-dy, v = 2t-1+dx'-dx, zero outside |u|,|v| <= 1;
  - a stride-(.,2,2) conv == the same VALID packed conv with an UNPACKED
    output channel block (only dy=dx=0 outputs exist);
  - a stride-(1,2,2) transposed conv (kernel == stride, the nnUNet decoder
    shape) == a POINTWISE conv straight into packed layout:
    W1[ci,(dy,dx,co)] = Wt[dy,dx,ci,co]; the (2,2,2) variant additionally
    interleaves D;
  - InstanceNorm statistics aggregate exactly: each original channel's
    spatial mean/var is the average of its four (dy,dx) group moments.

All functions are jnp-traceable so weight repacking happens inside the same
jit as the forward (XLA folds the rearrangement into the weight constant
when params are donated/closed-over).

Eq-FLOP inflation: a packed 3x3->2x2 conv does 16/9 the MACs of the
original. On this chip that trades at worst ~1.8x FLOPs for ~4-20x rate.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------ layout ops

def space_to_depth_hw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C), channel order (dy, dx, c)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    nd = x.ndim
    # (..., h2, dy, w2, dx, c) -> (..., h2, w2, dy, dx, c)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, h // 2, w // 2, 4 * c)


def depth_to_space_hw(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_hw`."""
    *lead, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*lead, h2, w2, 2, 2, c)
    nd = x.ndim
    # (..., h2, w2, dy, dx, c) -> (..., h2, dy, w2, dx, c)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, 2 * h2, 2 * w2, c)


def offset_pack_hw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2+1, W/2+1, 4C): packed cells shifted one
    pixel up-left (cell i covers rows 2i-1, 2i), zero-padded at the rim —
    the input layout every VALID packed conv below consumes."""
    nd = x.ndim
    pads = [(0, 0)] * (nd - 3) + [(1, 1), (1, 1), (0, 0)]
    return space_to_depth_hw(jnp.pad(x, pads))


def aligned_to_offset_hw(xp: jnp.ndarray) -> jnp.ndarray:
    """Aligned-packed (..., h, w, 4C) -> offset-packed (..., h+1, w+1, 4C)."""
    return offset_pack_hw(depth_to_space_hw(xp))


# ------------------------------------------------------------ weight packs

def _iter_pack(ci_splits):
    """Offsets of each input split inside the packed channel axis."""
    total = sum(ci_splits)
    starts = np.cumsum([0] + list(ci_splits[:-1]))
    return total, starts


def pack_conv_weights(w: jnp.ndarray, in_splits=None,
                      packed_out: bool = True) -> jnp.ndarray:
    """(kd, 3, 3, Ci, Co) -> (kd, 2, 2, 4Ci, 4Co if packed_out else Co).

    in_splits: channel sizes of concatenated packed inputs ([Ca, Cb] for a
    decoder concat) — the packed input layout is then
    [pack(Ca) || pack(Cb)], matching jnp.concatenate of packed tensors.
    packed_out=False builds the strided-conv variant (output dy=dx=0 only).
    """
    kd, kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    in_splits = list(in_splits) if in_splits is not None else [ci]
    assert sum(in_splits) == ci
    n_out = 4 * co if packed_out else co
    out = jnp.zeros((kd, 2, 2, 4 * ci, n_out), w.dtype)

    ci_off = 0       # offset into the original (unpacked) channel axis
    pk_off = 0       # offset into the packed channel axis
    for cs in in_splits:
        wblk = w[:, :, :, ci_off:ci_off + cs]
        for s in (0, 1):
            for t in (0, 1):
                for dyp in (0, 1):
                    for dxp in (0, 1):
                        for dy, dx in (((0, 0),) if not packed_out else
                                       ((0, 0), (0, 1), (1, 0), (1, 1))):
                            u = 2 * s - 1 + dyp - dy
                            v = 2 * t - 1 + dxp - dx
                            if not (-1 <= u <= 1 and -1 <= v <= 1):
                                continue
                            r0 = pk_off + (dyp * 2 + dxp) * cs
                            c0 = (dy * 2 + dx) * co if packed_out else 0
                            out = out.at[:, s, t, r0:r0 + cs,
                                         c0:c0 + co].set(wblk[:, u + 1, v + 1])
        ci_off += cs
        pk_off += 4 * cs
    return out


def pack_transpconv_weights(wt: jnp.ndarray) -> jnp.ndarray:
    """Stride==kernel (kd,2,2) transposed-conv weights -> pointwise packed
    weights (kd, Ci, 4Co): each input pixel's 2x2 output block is one packed
    cell, so upsampling is a 1x1 conv in packed space.

    Input layout (kd, 2, 2, Co, Ci): flax ConvTranspose(transpose_kernel=
    True) stores (spatial..., out, in) with DIRECT (unflipped) spatial
    indexing for the kernel==stride case (probed empirically; see
    tests/test_packed_segmodel.py)."""
    kd, two_a, two_b, co, ci = wt.shape
    assert two_a == 2 and two_b == 2
    # (kd, dy, dx, co, ci) -> (kd, ci, dy, dx, co) -> (kd, ci, 4co)
    return wt.transpose(0, 4, 1, 2, 3).reshape(kd, ci, 4 * co)


# ------------------------------------------------------------ packed ops

def conv_packed(xp: jnp.ndarray, wp: jnp.ndarray, b, *,
                d_stride: int = 1) -> jnp.ndarray:
    """VALID packed conv. xp: (B, D, h+1, w+1, 4Ci) offset-packed;
    wp: (kd, 2, 2, 4Ci, Cout'). kd==1 folds D into the batch (2D conv, the
    fast emitter path); kd==3 stays a 5D conv with SAME padding along D.
    Bias b is in the OUTPUT layout (packed or not) or None."""
    kd = wp.shape[0]
    if kd == 1:
        bsz, d, hp, wp_, c = xp.shape
        y = jax.lax.conv_general_dilated(
            xp.reshape(bsz * d, hp, wp_, c), wp[0],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)
        y = y.reshape(bsz, d, *y.shape[1:])
    else:
        y = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(d_stride, 1, 1),
            padding=((kd // 2, kd // 2), (0, 0), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=xp.dtype)
    if b is not None:
        y = y + b
    return y


def pointwise_packed_transpconv(x: jnp.ndarray, wp: jnp.ndarray,
                                b) -> jnp.ndarray:
    """x: (B, D, h, w, Ci) unpacked; wp: (kd, Ci, 4Co) from
    pack_transpconv_weights. kd==1: output aligned-packed (B, D, h, w, 4Co).
    kd==2: D doubles — output (B, 2D, h, w, 4Co)."""
    kd = wp.shape[0]
    if kd == 1:
        y = jnp.einsum("bdhwc,ce->bdhwe", x, wp[0],
                       preferred_element_type=x.dtype)
    else:
        y = jnp.einsum("bdhwc,kce->bdkhwe", x, wp,
                       preferred_element_type=x.dtype)
        bsz, d, k, h, w, e = y.shape
        y = y.reshape(bsz, d * k, h, w, e)
    if b is not None:
        y = y + b
    return y


def pack_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(C,) -> (4C,) tiled over the four (dy, dx) groups."""
    return jnp.tile(b, 4)


def instance_norm_packed(xp: jnp.ndarray, scale, bias,
                         epsilon: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over true spatial extent on an aligned-packed tensor.

    xp: (B, D, h, w, 4C); scale/bias: (C,) affine params or None. The four
    (dy, dx) groups of one channel are the same channel, so the exact
    per-channel moments are the group-averaged E[x], E[x^2]."""
    b_, d, h, w, c4 = xp.shape
    c = c4 // 4
    xg = xp.reshape(b_, d, h, w, 4, c)
    # same dtype/formula as models.layers.InstanceNorm for exact parity
    m1 = jnp.mean(xg, axis=(1, 2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 3, 4), keepdims=True)
    y = (xg - m1) * jax.lax.rsqrt(var + epsilon)
    if scale is not None:
        y = y * scale + bias
    return y.reshape(b_, d, h, w, c4)
