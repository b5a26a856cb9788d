"""Stage-level A/B of the padded-width ("static canvas") packed layout
vs the production alternating-parity layout (docs/BENCHMARKS.md
"Packed-width alignment probe" follow-up).

The first probe timed ONE bare conv; this one times what the engine
actually runs per stage: a 4-deep conv -> mask -> instance-norm ->
leaky -> mask chain at each packed stage's production geometry, so the
canvas variant pays its real costs (extra MACs on pad columns + mask
multiplies on EVERY conv, not just offset-parity ones) and its real win
(8-aligned widths for XLA's conv emitter).

Canvas formulation: all tensors of a stage live on a fixed (Hc, Wc)
grid, content in the top-left (true h', w' cells per parity), the rest
exact zeros. Stride-1 convs keep the canvas via asymmetric pads:
offset->aligned uses pad (0,1) (VALID reach + one extra), aligned->
offset uses pad (1,0). Garbage written beyond the true extent is masked
to zero around the norm (post-conv and post-act, like the production
offset rim handling).

Run on the real chip. Decision gate (ROADMAP round-5 lead): implement
the canvas layout only if the summed stage-level win projects >= ~4%
on the whole engine.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.pack2d import (
    pack_conv_weights, pack_bias, conv_packed, instance_norm_packed,
    offset_rim_mask)

B = 8
SLOPE = 0.01
EPS = 1e-5


def _leaky(x):
    return jnp.where(x >= 0, x, x * SLOPE)


def _box_mask(hp, wp, th, tw, c4, dtype, rim=False):
    """(hp, wp, c4) mask: 1 inside the true (th, tw) box, 0 outside.
    rim=True additionally zeroes the offset rim slots inside the box
    (same math as offset_rim_mask, bounds swapped to the true extent)."""
    ih = lax.broadcasted_iota(jnp.int32, (hp, wp, 4), 0)
    iw = lax.broadcasted_iota(jnp.int32, (hp, wp, 4), 1)
    ok = (ih < th) & (iw < tw)
    if rim:
        g = lax.broadcasted_iota(jnp.int32, (hp, wp, 4), 2)
        dy, dx = g // 2, g % 2
        ok = ok & (((ih > 0) | (dy == 1)) & ((ih < th - 1) | (dy == 0))
                   & ((iw > 0) | (dx == 1)) & ((iw < tw - 1) | (dx == 0)))
    return jnp.repeat(ok.astype(dtype), c4 // 4, axis=-1)


def _norm_true_count(y, n_true):
    """Instance norm with moments over the true pixel count (pads are
    exact zeros so plain sums are correct); group-averaged like
    instance_norm_packed."""
    b_, d, h, w, c4 = y.shape
    c = c4 // 4
    x32 = y.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2, 3)) / n_true
    s2 = jnp.sum(jnp.square(x32), axis=(1, 2, 3)) / n_true
    m1 = jnp.tile(jnp.mean(s1.reshape(b_, 4, c), axis=1), (1, 4))
    m2 = jnp.tile(jnp.mean(s2.reshape(b_, 4, c), axis=1), (1, 4))
    v = m2 - jnp.square(m1)
    k = lax.rsqrt(v + EPS)
    return (y - m1[:, None, None, None, :].astype(y.dtype)) \
        * k[:, None, None, None, :].astype(y.dtype)


def _conv_canvas(x, wp, b, pad):
    """Stride-1 packed conv keeping the canvas shape. kd==1 folds D."""
    kd = wp.shape[0]
    if kd == 1:
        bsz, d, hp, wpx, c = x.shape
        y = lax.conv_general_dilated(
            x.reshape(bsz * d, hp, wpx, c), wp[0], window_strides=(1, 1),
            padding=(pad, pad), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = y.reshape(bsz, d, *y.shape[1:])
    else:
        y = lax.conv_general_dilated(
            x, wp, window_strides=(1, 1, 1),
            padding=((kd // 2, kd // 2), pad, pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)
    return y + b if b is not None else y


def chain_current(x_off, wps, biases, n_convs, cch):
    """Production formulation: alternating offset/aligned parities with
    shape changes; masks only around offset-parity outputs."""
    y, parity = x_off, "o"
    for i in range(n_convs):
        if parity == "o":
            y = conv_packed(y, wps[i], biases[i])            # -> aligned
            y = _leaky(instance_norm_packed(y, None, None, EPS))
            parity = "a"
        else:
            y = conv_packed(y, wps[i], biases[i], hw_pad="pad11")
            m = offset_rim_mask(y.shape[2], y.shape[3], cch, y.dtype)
            y = y * m
            y = instance_norm_packed(y, None, None, EPS, offset_parity=True)
            y = _leaky(y) * m
            parity = "o"
    return jnp.sum(y.astype(jnp.float32))


def chain_canvas(x_off, wps, biases, n_convs, cch, th, tw, d):
    """Canvas formulation: fixed shape, content box alternates between
    offset (th/2+1, tw/2+1) and aligned (th/2, tw/2) true extents."""
    y, parity = x_off, "o"
    hp, wp_ = y.shape[2], y.shape[3]
    for i in range(n_convs):
        if parity == "o":
            y = _conv_canvas(y, wps[i], biases[i], (0, 1))
            bh, bw = th // 2, tw // 2                       # aligned box
            m = _box_mask(hp, wp_, bh, bw, y.shape[-1], y.dtype)
            n = d * bh * bw
            parity = "a"
        else:
            y = _conv_canvas(y, wps[i], biases[i], (1, 0))
            bh, bw = th // 2 + 1, tw // 2 + 1               # offset box
            m = _box_mask(hp, wp_, bh, bw, y.shape[-1], y.dtype, rim=True)
            n = d * (bh - 1) * (bw - 1)
            parity = "o"
        y = y * m
        y = _norm_true_count(y, n)
        y = _leaky(y) * m
    return jnp.sum(y.astype(jnp.float32))


def bench(f, x):
    g = jax.jit(f)
    jax.block_until_ready(g(x))
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(g(x))
        best = min(best, time.perf_counter() - t0)
    return best


def run_stage(tag, d, th, tw, c, kd, canvases, n_convs=4):
    """th, tw: true UNPACKED patch extent at this stage; c: stage feats."""
    key = jax.random.key(0)
    hp0, wp0 = th // 2 + 1, tw // 2 + 1                     # offset cells
    w_raw = jax.random.normal(key, (kd, 3, 3, c, c), jnp.bfloat16) * 0.05
    wp = pack_conv_weights(w_raw)
    bia = pack_bias(jnp.zeros((c,), jnp.bfloat16))
    wps, biases = [wp] * n_convs, [bia] * n_convs

    x = jax.random.normal(key, (B, d, hp0, wp0, 4 * c), jnp.bfloat16)
    rim = offset_rim_mask(hp0, wp0, c, x.dtype)
    x = x * rim

    t = bench(lambda xx: chain_current(xx, wps, biases, n_convs, c), x)
    base_px = d * (th // 2) * (tw // 2) * B * n_convs
    print(f"{tag} current ({hp0},{wp0})alt   : {t*1e3:7.2f} ms  "
          f"({t*1e12/base_px:6.1f} ps/cell)", flush=True)
    base = t

    for hc, wc in canvases:
        xc = jnp.zeros((B, d, hc, wc, 4 * c), jnp.bfloat16)
        xc = xc.at[:, :, :hp0, :wp0, :].set(x)

        t = bench(lambda xx: chain_canvas(xx, wps, biases, n_convs,
                                          c, th, tw, d), xc)
        # exactness sanity: both formulations compute the same true content
        s_cur = float(jax.jit(lambda xx: chain_current(
            xx, wps, biases, n_convs, c))(x))
        s_can = float(jax.jit(lambda xx: chain_canvas(
            xx, wps, biases, n_convs, c, th, tw, d))(xc))
        rel = abs(s_cur - s_can) / max(abs(s_cur), 1e-9)
        print(f"{tag} canvas  ({hc},{wc})fix : {t*1e3:7.2f} ms  "
              f"({t*1e12/base_px:6.1f} ps/cell)  "
              f"{(base/t-1)*100:+5.1f}%  d={rel:.1e}", flush=True)


if __name__ == "__main__":
    # stage 0: (1,3,3) convs fold D; cells (161,193)/(160,192)
    run_stage("s0 c32 ", 16, 320, 384, 32, 1,
              [(161, 200), (168, 200), (168, 208)])
    # stage 1: (3,3,3) convs, cells (81,97)/(80,96)
    run_stage("s1 c64 ", 16, 160, 192, 64, 3,
              [(81, 104), (88, 104)])
    # stage 2: cells (41,49)/(40,48)
    run_stage("s2 c128", 8, 80, 96, 128, 3,
              [(41, 56), (48, 56)])
