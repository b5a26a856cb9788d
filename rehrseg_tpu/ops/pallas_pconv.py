"""Production Pallas TPU kernel: stride-1 (2,2)-cell packed convs.

The dominant conv class of the packed eval path (models/segnet_packed.py)
is the stride-1 (2,2)-kernel conv over 128-512 packed lanes — the
offset->aligned VALID conv and the aligned->offset "pad11" conv that
alternate through every stage (reference compute: cuDNN 3x3 convs,
seg_model.py:153-210). XLA's conv emitter sustains 49-80 raw TFLOP/s on
these shapes vs a ~125-137 TF/s chip peak (docs/BENCHMARKS.md round-2
conv study + round-4 peak correction); this kernel feeds the MXU four
shifted (M,4Ci)@(4Ci,Co) dots per row-slab with the input slab RESIDENT
in VMEM across all four taps (one HBM read of x total), double-buffered
HBM<->VMEM DMAs on both ends, fp32 accumulation, and the bias folded
into the epilogue.

Why this compiles where round 2's ops/pallas_conv.py did not: Mosaic
requires DMA slice extents along the sublane (width) dim to be 8-aligned,
and offset-parity packed tensors have odd widths (w/2+1 = 193 at bench
geometry). The fix is NOT a standalone relayout pass (24-38 ms, erases
the win) — the convs that EMIT offset tensors simply emit them at width
padded up to the next 8-multiple (pconv_pad11 writes the pad columns as
exact zeros for free; XLA-emitted offset tensors get the extra columns
by widening the conv's own right-padding). This is the narrow,
kernel-enabling slice of the "canvas layout" idea whose FULL stage-level
form measured negative in round 4 (packed_width_probe2.py) — here only
offset-parity tensors widen (they already pay rim masks), aligned
tensors keep their exact shapes, and no extra mask passes appear.

Variants (both consume (2, 2, 4Ci, Co) weights from
ops.pack2d.pack_conv_weights):

  pconv_valid:  offset (N, hp, wp8, 4Ci) -> aligned (N, hp-1, w_out, Co)
                == conv_packed(..., hw_pad="valid") on the true
                wp = w_out + 1 leading columns
  pconv_pad11:  aligned (N, h, w, 4Ci) -> offset (N, h+1, wp8, Co)
                == conv_packed(..., hw_pad="pad11"), with cols > w
                written as exact zeros (wp8 = round_up(w + 1, 8))

Numerics: fp32 accumulation (the MXU accumulates fp32 internally either
way; XLA's conv writes bf16 partials between taps at bf16 preferred
type, so this kernel is slightly MORE accurate, within the packed-model
test tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_bytes(bi, w_slab, c_in, w_out, c_out, itemsize):
    slab = 2 * (bi + 1) * w_slab * c_in * itemsize
    wts = 4 * c_in * c_out * itemsize
    acc = bi * w_out * c_out * 4
    ybuf = 2 * bi * w_out * c_out * itemsize
    return slab + wts + acc + ybuf


def _pick_bi(h, w_slab, c_in, w_out, c_out, itemsize=2):
    for bi in (16, 8, 4, 2):
        if h % bi == 0 and _vmem_bytes(bi, w_slab, c_in, w_out, c_out,
                                       itemsize) < _VMEM_BUDGET:
            return bi
    return None


# --------------------------------------------------------------- VALID

def _valid_kernel(x_hbm, w_ref, b_ref, o_hbm, *, n_imgs, bi, n_blocks,
                  w_out, c_out):
    """offset (N, hp, wp8, Ci) -> aligned (N, hp-1, w_out, Co).

    Per (image, block): fetch slab (bi+1, wp8, Ci) = input rows
    i*bi .. i*bi+bi, compute the four taps
    out[r, c] = sum_{s,t} x[r+s, c+t] @ W[s, t] with the slab resident in
    VMEM, write (bi, w_out, Co). Double-buffered on both ends.
    """
    total = n_imgs * n_blocks

    def body(xbuf, ybuf, in_sem, out_sem):
        def in_dma(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            return pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(i * bi, bi + 1)], xbuf.at[slot],
                in_sem.at[slot])

        def out_dma(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            return pltpu.make_async_copy(
                ybuf.at[slot], o_hbm.at[n, pl.ds(i * bi, bi)],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def loop(blk, _):
            slot = blk % 2

            @pl.when(blk + 1 < total)
            def _():
                in_dma((blk + 1) % 2, blk + 1).start()

            in_dma(slot, blk).wait()
            x = xbuf[slot]                       # (bi+1, wp8, Ci)
            acc = jnp.zeros((bi, w_out, c_out), jnp.float32)
            for s in (0, 1):
                for t in (0, 1):
                    xs = x[s:s + bi, t:t + w_out, :]
                    acc = acc + jax.lax.dot_general(
                        xs, w_ref[s, t],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            y = acc + b_ref[0, 0].astype(jnp.float32)

            # the ybuf slot may still be draining to HBM from 2 blocks ago
            @pl.when(blk >= 2)
            def _():
                out_dma(slot, blk - 2).wait()

            ybuf[slot] = y.astype(ybuf.dtype)
            out_dma(slot, blk).start()
            return _

        jax.lax.fori_loop(0, total, loop, None)
        out_dma((total - 1) % 2, total - 1).wait()

        @pl.when(jnp.asarray(total >= 2))
        def _():
            out_dma((total - 2) % 2, total - 2).wait()

    wp8, c_in = x_hbm.shape[2], x_hbm.shape[3]
    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((2, bi + 1, wp8, c_in), x_hbm.dtype),
        ybuf=pltpu.VMEM((2, bi, w_out, c_out), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _valid_fused_kernel(x_hbm, w_ref, b_ref, *rest, n_imgs, bi, n_blocks,
                        w_out, c_out, pre, want_stats, slope=0.0,
                        wide=False):
    """offset (N, hp, wp8, Ci) -> aligned (N, hp-1, w_out, Co), the
    deferred-norm (pallas_conv="fused") form of _valid_kernel.

    pre: the producer deferred its instance norm — the slab gets
    `rim_mask * leaky(x * sA + tA)` applied in VMEM right after the DMA
    (sA/tA per image from pack2d.norm_scale_shift_from_stats), so the
    normalize pass's HBM read+write never happens. The rim mask runs
    here regardless of who produced x (an XLA conv's raw offset output
    has garbage rim).

    want_stats: emit (N, 16, Co) fp32 moment partials of the stored
    aligned output (no rim on aligned parity).

    wide: one dot per row-tap s with doubled-N weights
    [W[s,0] | W[s,1]] over the full slab width, column taps combined by
    a single shifted f32 add (the experiments/pconv_valid_tune.py
    structure probe)."""
    k = 0
    if pre:
        sa_ref, ta_ref = rest[0], rest[1]
        k = 2
    o_hbm = rest[k]
    stats_ref = rest[k + 1] if want_stats else None
    total = n_imgs * n_blocks
    hp_in = n_blocks * bi + 1
    tw_in = w_out + 1

    def body(xbuf, ybuf, in_sem, out_sem):
        def in_dma(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            return pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(i * bi, bi + 1)], xbuf.at[slot],
                in_sem.at[slot])

        def out_dma(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            return pltpu.make_async_copy(
                ybuf.at[slot], o_hbm.at[n, pl.ds(i * bi, bi)],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def loop(blk, _):
            slot = blk % 2
            n = blk // n_blocks
            i = blk % n_blocks

            @pl.when(blk + 1 < total)
            def _():
                in_dma((blk + 1) % 2, blk + 1).start()

            in_dma(slot, blk).wait()
            x = xbuf[slot]                       # (bi+1, wp8, Ci)
            wp8, c_in = x.shape[1], x.shape[2]
            if pre:
                sa = sa_ref[pl.ds(n, 1), 0].reshape(1, 1, c_in)
                ta = ta_ref[pl.ds(n, 1), 0].reshape(1, 1, c_in)
                x = x * sa + ta
                x = jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))
                x = x * _offset_mask(i * bi, bi + 1, hp_in, tw_in, wp8,
                                     c_in, x.dtype)
            if wide:
                p = jnp.zeros((bi, wp8, 2 * c_out), jnp.float32)
                for s in (0, 1):
                    p = p + jax.lax.dot_general(
                        x[s:s + bi, :, :], w_ref[s],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                acc = p[:, :w_out, :c_out] + p[:, 1:w_out + 1, c_out:]
            else:
                acc = jnp.zeros((bi, w_out, c_out), jnp.float32)
                for s in (0, 1):
                    for t in (0, 1):
                        xs = x[s:s + bi, t:t + w_out, :]
                        acc = acc + jax.lax.dot_general(
                            xs, w_ref[s, t],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            y = acc + b_ref[0, 0].astype(jnp.float32)

            @pl.when(blk >= 2)
            def _():
                out_dma(slot, blk - 2).wait()

            ybf = y.astype(ybuf.dtype)
            ybuf[slot] = ybf
            out_dma(slot, blk).start()
            if want_stats:
                st = _stats16(ybf.astype(jnp.float32))

                @pl.when(i == 0)
                def _():
                    stats_ref[pl.ds(n, 1)] = st[None]

                @pl.when(i != 0)
                def _():
                    stats_ref[pl.ds(n, 1)] = stats_ref[pl.ds(n, 1)] \
                        + st[None]
            return _

        jax.lax.fori_loop(0, total, loop, None)
        out_dma((total - 1) % 2, total - 1).wait()

        @pl.when(jnp.asarray(total >= 2))
        def _():
            out_dma((total - 2) % 2, total - 2).wait()

    wp8, c_in = x_hbm.shape[2], x_hbm.shape[3]
    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((2, bi + 1, wp8, c_in), x_hbm.dtype),
        ybuf=pltpu.VMEM((2, bi, w_out, c_out), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


# --------------------------------------------------------------- PAD11

def _pad11_kernel(x_hbm, w_ref, b_ref, o_hbm, *, n_imgs, bi, n_blocks,
                  w_in, wp8_out, c_in, c_out):
    """aligned (N, h, w_in, Ci) -> offset (N, h+1, wp8_out, Co).

    out[r, c] = sum_{s,t in 0..1} x[r-1+s, c-1+t] @ W[s, t] (zero outside
    the input). Main loop covers out rows 0 .. h-1 in blocks of bi; the
    final out row h (reading input row h-1 only) is an epilogue. The
    first block of each image fetches bi rows into slab[1:] and zeroes
    slab[0] (input row -1); other blocks fetch bi+1 rows from i*bi - 1.
    Output cols > w_in are written as exact zeros.
    """
    total = n_imgs * n_blocks
    h = n_blocks * bi

    def body(xbuf, ybuf, tin, tout, in_sem, out_sem, t_sem):
        def in_dma_first(slot, n):
            return pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(0, bi)], xbuf.at[slot, pl.ds(1, bi)],
                in_sem.at[slot])

        def in_dma_rest(slot, n, i):
            return pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(i * bi - 1, bi + 1)], xbuf.at[slot],
                in_sem.at[slot])

        def start_in(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            if n_blocks == 1:           # i != 0 branch would trace an
                in_dma_first(slot, n).start()   # oversized (bi+1)-row slice
                return

            @pl.when(i == 0)
            def _():
                in_dma_first(slot, n).start()

            @pl.when(i != 0)
            def _():
                in_dma_rest(slot, n, i).start()

        def wait_in(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            if n_blocks == 1:
                in_dma_first(slot, n).wait()
                return

            @pl.when(i == 0)
            def _():
                in_dma_first(slot, n).wait()

            @pl.when(i != 0)
            def _():
                in_dma_rest(slot, n, i).wait()

        def out_dma(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            return pltpu.make_async_copy(
                ybuf.at[slot], o_hbm.at[n, pl.ds(i * bi, bi)],
                out_sem.at[slot])

        start_in(0, 0)

        def loop(blk, _):
            slot = blk % 2
            i = blk % n_blocks

            @pl.when(blk + 1 < total)
            def _():
                start_in((blk + 1) % 2, blk + 1)

            wait_in(slot, blk)

            @pl.when(i == 0)
            def _():
                xbuf[slot, 0] = jnp.zeros((w_in, c_in), xbuf.dtype)

            x = xbuf[slot]                       # (bi+1, w_in, Ci)
            # group taps by t and place each group's column range with a
            # concat (Mosaic has no scatter-add; .at[].add won't lower)
            a = jnp.zeros((bi, w_in, c_out), jnp.float32)   # t=0: cols 1..w
            bt = jnp.zeros((bi, w_in, c_out), jnp.float32)  # t=1: cols 0..w-1
            for s in (0, 1):
                xs = x[s:s + bi, :, :]
                a = a + jax.lax.dot_general(
                    xs, w_ref[s, 0],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bt = bt + jax.lax.dot_general(
                    xs, w_ref[s, 1],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            z1 = jnp.zeros((bi, 1, c_out), jnp.float32)
            zr = jnp.zeros((bi, wp8_out - w_in - 1, c_out), jnp.float32)
            acc = (jnp.concatenate([z1, a, zr], axis=1)
                   + jnp.concatenate([bt, z1, zr], axis=1))
            col = jax.lax.broadcasted_iota(jnp.int32, (bi, wp8_out, 1), 1)
            y = (acc + b_ref[0, 0].astype(jnp.float32)) \
                * (col <= w_in).astype(jnp.float32)

            @pl.when(blk >= 2)
            def _():
                out_dma(slot, blk - 2).wait()

            ybuf[slot] = y.astype(ybuf.dtype)
            out_dma(slot, blk).start()
            return _

        jax.lax.fori_loop(0, total, loop, None)
        out_dma((total - 1) % 2, total - 1).wait()

        @pl.when(jnp.asarray(total >= 2))
        def _():
            out_dma((total - 2) % 2, total - 2).wait()

        # ---- epilogue: out row h of each image reads input row h-1 only
        def tail_loop(n, _):
            cp_in = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(h - 1, 1)], tin, t_sem.at[0])
            cp_in.start()
            cp_in.wait()
            z1 = jnp.zeros((1, 1, c_out), jnp.float32)
            zr = jnp.zeros((1, wp8_out - w_in - 1, c_out), jnp.float32)
            da = jax.lax.dot_general(
                tin[:, :, :], w_ref[0, 0],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db = jax.lax.dot_general(
                tin[:, :, :], w_ref[0, 1],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = (jnp.concatenate([z1, da, zr], axis=1)
                   + jnp.concatenate([db, z1, zr], axis=1))
            col = jax.lax.broadcasted_iota(jnp.int32, (1, wp8_out, 1), 1)
            tout[:, :, :] = ((acc + b_ref[0, 0].astype(jnp.float32))
                             * (col <= w_in).astype(jnp.float32)
                             ).astype(tout.dtype)
            cp_out = pltpu.make_async_copy(
                tout, o_hbm.at[n, pl.ds(h, 1)], t_sem.at[1])
            cp_out.start()
            cp_out.wait()
            return _

        jax.lax.fori_loop(0, n_imgs, tail_loop, None)

    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((2, bi + 1, w_in, c_in), x_hbm.dtype),
        ybuf=pltpu.VMEM((2, bi, wp8_out, c_out), o_hbm.dtype),
        tin=pltpu.VMEM((1, w_in, c_in), x_hbm.dtype),
        tout=pltpu.VMEM((1, wp8_out, c_out), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        t_sem=pltpu.SemaphoreType.DMA((2,)),
    )


# --------------------------------------------------------------- wrappers

@functools.partial(jax.jit, static_argnames=("w_out", "bi", "interpret"))
def _valid_call(x, w, b, *, w_out, bi, interpret=False):
    n, hp, wp8, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - 1
    kern = functools.partial(
        _valid_kernel, n_imgs=n, bi=bi, n_blocks=h // bi,
        w_out=w_out, c_out=c_out)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w_out, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (1, 1, C)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # written via DMA
        interpret=interpret,
    )(x, w, b)


@functools.partial(jax.jit, static_argnames=("wp8_out", "bi", "interpret"))
def _pad11_call(x, w, b, *, wp8_out, bi, interpret=False):
    n, h, w_in, c_in = x.shape
    c_out = w.shape[-1]
    kern = functools.partial(
        _pad11_kernel, n_imgs=n, bi=bi, n_blocks=h // bi, w_in=w_in,
        wp8_out=wp8_out, c_in=c_in, c_out=c_out)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h + 1, wp8_out, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        interpret=interpret,
    )(x, w, b)


_FUSED_VMEM_BUDGET = 24 * 1024 * 1024


def _pick_bi_fused(h, wp8, c_in, w_out, c_out, itemsize, wide):
    for bi in (32, 16, 8, 4, 2):
        slab = 2 * (bi + 1) * wp8 * c_in * itemsize
        wts = 4 * c_in * c_out * itemsize
        acc = (bi * wp8 * 2 * c_out * 4 if wide
               else bi * w_out * c_out * 4)
        ybuf = 2 * bi * w_out * c_out * itemsize
        if h % bi == 0 and (slab + wts + acc + ybuf) < _FUSED_VMEM_BUDGET:
            return bi
    return None


@functools.partial(jax.jit, static_argnames=(
    "w_out", "bi", "interpret", "want_stats", "slope", "wide", "has_pre"))
def _valid_fused_call(x, w, b, sa, ta, *, w_out, bi, interpret,
                      want_stats, slope, wide, has_pre):
    n, hp, wp8, c_in = x.shape
    c_out = w.shape[-1] // (2 if wide else 1)
    kern = functools.partial(
        _valid_fused_kernel, n_imgs=n, bi=bi, n_blocks=(hp - 1) // bi,
        w_out=w_out, c_out=c_out, pre=has_pre, want_stats=want_stats,
        slope=slope, wide=wide)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = (x, w, b)
    if has_pre:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += (sa, ta)
    out_shape = jax.ShapeDtypeStruct((n, hp - 1, w_out, c_out), x.dtype)
    out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
    if want_stats:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 16, c_out), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern, out_shape=out_shape, in_specs=in_specs,
        out_specs=out_specs, interpret=interpret)(*args)


def pconv_valid(x, w, b=None, *, w_out=None, interpret=None, pre=None,
                want_stats=False, wide=False):
    """Offset-packed x (N, hp, wp8, 4Ci), wp8 % 8 == 0 (pad columns zero /
    ignored), packed weights w (2, 2, 4Ci, Co) -> aligned
    (N, hp-1, w_out, Co) with bias folded. Equals
    conv_packed(x_true, w, b, hw_pad="valid") on the true wp = w_out + 1
    leading columns. Returns None when the shape isn't covered (caller
    falls back to the XLA conv).

    Deferred-norm extensions (pallas_conv="fused",
    models/segnet_packed.py):
    - pre=(sa, ta, slope): x is a RAW offset conv output whose instance
      norm was deferred — the kernel applies
      rim_mask * leaky(x * sa + ta) on each VMEM slab after the DMA
      (sa/ta: (N, 8, 4Ci) from pack2d.norm_scale_shift_from_stats).
    - want_stats: also return (N, 16, Co) fp32 moment partials of the
      aligned output -> returns (y, stats).
    - wide: the doubled-N dot structure (see _valid_fused_kernel)."""
    n, hp, wp8, c_in = x.shape
    c_out = w.shape[-1]
    if w_out is None:
        w_out = wp8 - 8 if wp8 % 16 == 0 else wp8 - 1
    if (wp8 % 8 or w_out % 8 or w_out + 1 > wp8 or c_in % 128
            or c_out % 128):
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias = (jnp.zeros((1, 1, c_out), x.dtype) if b is None
            else jnp.asarray(b, x.dtype).reshape(1, 1, -1))
    if pre is None and not want_stats and not wide:
        bi = _pick_bi(hp - 1, wp8, c_in, w_out, c_out)
        if bi is None:
            return None
        return _valid_call(x, jnp.asarray(w, x.dtype), bias, w_out=w_out,
                           bi=bi, interpret=bool(interpret))
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    bi = _pick_bi_fused(hp - 1, wp8, c_in, w_out, c_out, itemsize, wide)
    if bi is None:
        return None
    wk = jnp.asarray(w, x.dtype)
    if wide:
        wk = jnp.concatenate([wk[:, 0], wk[:, 1]], axis=-1)  # (2, Ci, 2Co)
    if pre is not None:
        sa, ta, slope = pre
        sa = jnp.asarray(sa, x.dtype)
        ta = jnp.asarray(ta, x.dtype)
        has_pre = True
    else:
        sa = ta = jnp.zeros((1, 8, c_in), x.dtype)
        slope = 0.0
        has_pre = False
    return _valid_fused_call(x, wk, bias, sa, ta, w_out=w_out, bi=bi,
                             interpret=bool(interpret),
                             want_stats=want_stats, slope=float(slope),
                             wide=wide, has_pre=has_pre)


def pconv_pad11(x, w, b=None, *, interpret=None):
    """Aligned-packed x (N, h, w, 4Ci) -> offset (N, h+1, wp8, Co), where
    wp8 = round_up(w + 1, 8); cols > w are exact zeros. Equals
    conv_packed(x, w, b, hw_pad="pad11") on the true 0..w columns (the
    caller's offset_rim_mask then zeroes the usual parity rim). Returns
    None when the shape isn't covered."""
    n, h, w_in, c_in = x.shape
    c_out = w.shape[-1]
    if w_in % 8 or c_in % 128 or c_out % 128:
        return None
    wp8_out = -(-(w_in + 1) // 8) * 8
    bi = _pick_bi(h, max(w_in, wp8_out), c_in, wp8_out, c_out)
    if bi is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias = (jnp.zeros((1, 1, c_out), x.dtype) if b is None
            else jnp.asarray(b, x.dtype).reshape(1, 1, -1))
    return _pad11_call(x, jnp.asarray(w, x.dtype), bias, wp8_out=wp8_out,
                       bi=bi, interpret=bool(interpret))


# ----------------------------------------------------------- PAD11 + CAT

def _stats16(y32):
    """(rows, width, c) fp32 -> (16, c) moment partials: rows 0:8 hold
    sum partials, 8:16 sum-of-squares (consumers sum each half — see
    pack2d.norm_scale_shift_from_stats).

    Layout-constrained on purpose: reduce axis 0 FIRST (the untiled
    vreg-batch axis — plain vector adds), then fold the width axis by
    whole 8-sublane tile groups. The obvious `y32.sum(axis=1)` reduces
    the SUBLANE axis of the (8, 128) tiles and real Mosaic rejects the
    resulting replicated-sublane layout ("Invalid relayout:
    non-singleton logical dimension is replicated in destination but
    not in source", v5e) even though interpret mode accepts it.
    Requires width % 8 == 0 (every caller's coverage check guarantees
    it)."""
    c = y32.shape[-1]
    width = y32.shape[1]

    def fold(t):  # (width, c) -> (8, c)
        return t.reshape(width // 8, 8, c).sum(0)

    s = y32.sum(axis=0)
    q = (y32 * y32).sum(axis=0)
    return jnp.concatenate([fold(s), fold(q)], axis=0)


def _offset_mask(r0, rows, hp, tw, wp8, c_out, dtype=jnp.float32):
    """In-kernel offset rim mask for rows r0..r0+rows-1 of an
    offset-parity tensor — the exact ops/pack2d.py offset_rim_mask
    predicate (rows/cols/lane-groups), so a fused kernel's output (or
    normalized input) never needs a materialized mask pass."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, wp8, c_out), 0) + r0
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, wp8, c_out), 1)
    g = jax.lax.broadcasted_iota(jnp.int32, (rows, wp8, c_out), 2) \
        // (c_out // 4)
    dy, dx = g // 2, g % 2
    ok = (((row > 0) | (dy == 1)) & ((row < hp - 1) | (dy == 0))
          & ((col > 0) | (dx == 1)) & ((col < tw - 1) | (dx == 0))
          & (col < tw))
    return ok.astype(dtype)


def _pad11_cat_kernel(xa_hbm, xb_hbm, w_ref, b_ref, o_hbm, *maybe_stats,
                      n_imgs, bi, n_blocks, w_in, wp8_out, ca, cb, c_out,
                      fused=False):
    """Fused concat + pad11: conv_packed(concat([xa, xb], -1), w, pad11)
    without ever materializing the concatenated tensor in HBM. Same loop
    structure as _pad11_kernel, but each row slab is assembled by TWO
    DMAs writing side by side into one channel-concatenated VMEM buffer
    (xa -> lanes [:ca], xb -> lanes [ca:]) — the compute then runs the
    identical full-K dots as the single-input kernel (a first version
    with separate buffers and split K=ca / K=cb dots measured 7% slower;
    lane-sliced DMA destinations at 128-multiples are tile-aligned and
    cost nothing).

    Production site: the decoder skip concat (models/segnet_packed.py
    dec_stage) whose pad_maximum_fusion costs 5.2% of the aligned
    engine's device time (docs/BENCHMARKS.md round-5 op profile).

    fused (the pallas_conv="fused" engine): the output additionally gets
    the FULL offset rim mask in-kernel (no _mask_offset pass downstream)
    and per-image moment partials of the stored value accumulate into a
    second (N, 16, Co) fp32 VMEM output — rows 0:8 sum, 8:16 sum of
    squares (see pack2d.norm_scale_shift_from_stats)."""
    stats_ref = maybe_stats[0] if maybe_stats else None
    total = n_imgs * n_blocks
    h = n_blocks * bi
    c_in = ca + cb

    def body(xbuf, ybuf, tin, tout, in_sem, out_sem, t_sem):
        def dmas_first(slot, n):
            return (pltpu.make_async_copy(
                        xa_hbm.at[n, pl.ds(0, bi)],
                        xbuf.at[slot, pl.ds(1, bi), :, pl.ds(0, ca)],
                        in_sem.at[slot, 0]),
                    pltpu.make_async_copy(
                        xb_hbm.at[n, pl.ds(0, bi)],
                        xbuf.at[slot, pl.ds(1, bi), :, pl.ds(ca, cb)],
                        in_sem.at[slot, 1]))

        def dmas_rest(slot, n, i):
            return (pltpu.make_async_copy(
                        xa_hbm.at[n, pl.ds(i * bi - 1, bi + 1)],
                        xbuf.at[slot, :, :, pl.ds(0, ca)],
                        in_sem.at[slot, 0]),
                    pltpu.make_async_copy(
                        xb_hbm.at[n, pl.ds(i * bi - 1, bi + 1)],
                        xbuf.at[slot, :, :, pl.ds(ca, cb)],
                        in_sem.at[slot, 1]))

        def start_in(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            if n_blocks == 1:
                for cp in dmas_first(slot, n):
                    cp.start()
                return

            @pl.when(i == 0)
            def _():
                for cp in dmas_first(slot, n):
                    cp.start()

            @pl.when(i != 0)
            def _():
                for cp in dmas_rest(slot, n, i):
                    cp.start()

        def wait_in(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            if n_blocks == 1:
                for cp in dmas_first(slot, n):
                    cp.wait()
                return

            @pl.when(i == 0)
            def _():
                for cp in dmas_first(slot, n):
                    cp.wait()

            @pl.when(i != 0)
            def _():
                for cp in dmas_rest(slot, n, i):
                    cp.wait()

        def out_dma(slot, blk):
            n = blk // n_blocks
            i = blk % n_blocks
            return pltpu.make_async_copy(
                ybuf.at[slot], o_hbm.at[n, pl.ds(i * bi, bi)],
                out_sem.at[slot])

        start_in(0, 0)

        def loop(blk, _):
            slot = blk % 2
            n = blk // n_blocks
            i = blk % n_blocks

            @pl.when(blk + 1 < total)
            def _():
                start_in((blk + 1) % 2, blk + 1)

            wait_in(slot, blk)

            @pl.when(i == 0)
            def _():
                xbuf[slot, 0] = jnp.zeros((w_in, c_in), xbuf.dtype)

            x = xbuf[slot]                       # (bi+1, w_in, Ca+Cb)
            a = jnp.zeros((bi, w_in, c_out), jnp.float32)   # t=0: cols 1..w
            bt = jnp.zeros((bi, w_in, c_out), jnp.float32)  # t=1: cols 0..w-1
            for s in (0, 1):
                xs = x[s:s + bi, :, :]
                a = a + jax.lax.dot_general(
                    xs, w_ref[s, 0],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bt = bt + jax.lax.dot_general(
                    xs, w_ref[s, 1],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            z1 = jnp.zeros((bi, 1, c_out), jnp.float32)
            zr = jnp.zeros((bi, wp8_out - w_in - 1, c_out), jnp.float32)
            acc = (jnp.concatenate([z1, a, zr], axis=1)
                   + jnp.concatenate([bt, z1, zr], axis=1))
            yb = acc + b_ref[0, 0].astype(jnp.float32)
            if fused:
                yb = yb * _offset_mask(i * bi, bi, h + 1, w_in + 1,
                                       wp8_out, c_out)
            else:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (bi, wp8_out, 1), 1)
                yb = yb * (col <= w_in).astype(jnp.float32)

            @pl.when(blk >= 2)
            def _():
                out_dma(slot, blk - 2).wait()

            ybf = yb.astype(ybuf.dtype)
            ybuf[slot] = ybf
            out_dma(slot, blk).start()
            if fused:
                st = _stats16(ybf.astype(jnp.float32))

                @pl.when(i == 0)
                def _():
                    stats_ref[pl.ds(n, 1)] = st[None]

                @pl.when(i != 0)
                def _():
                    stats_ref[pl.ds(n, 1)] = stats_ref[pl.ds(n, 1)] \
                        + st[None]
            return _

        jax.lax.fori_loop(0, total, loop, None)
        out_dma((total - 1) % 2, total - 1).wait()

        @pl.when(jnp.asarray(total >= 2))
        def _():
            out_dma((total - 2) % 2, total - 2).wait()

        # ---- epilogue: out row h of each image reads input row h-1 only
        def tail_loop(n, _):
            cpa = pltpu.make_async_copy(
                xa_hbm.at[n, pl.ds(h - 1, 1)], tin.at[:, :, pl.ds(0, ca)],
                t_sem.at[0])
            cpb = pltpu.make_async_copy(
                xb_hbm.at[n, pl.ds(h - 1, 1)], tin.at[:, :, pl.ds(ca, cb)],
                t_sem.at[1])
            cpa.start()
            cpb.start()
            cpa.wait()
            cpb.wait()
            z1 = jnp.zeros((1, 1, c_out), jnp.float32)
            zr = jnp.zeros((1, wp8_out - w_in - 1, c_out), jnp.float32)
            da = jax.lax.dot_general(
                tin[:, :, :], w_ref[0, 0],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db = jax.lax.dot_general(
                tin[:, :, :], w_ref[0, 1],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = (jnp.concatenate([z1, da, zr], axis=1)
                   + jnp.concatenate([db, z1, zr], axis=1))
            yb = acc + b_ref[0, 0].astype(jnp.float32)
            if fused:
                yb = yb * _offset_mask(h, 1, h + 1, w_in + 1,
                                       wp8_out, c_out)
            else:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (1, wp8_out, 1), 1)
                yb = yb * (col <= w_in).astype(jnp.float32)
            ybf = yb.astype(tout.dtype)
            tout[:, :, :] = ybf
            if fused:
                st = _stats16(ybf.astype(jnp.float32))
                stats_ref[pl.ds(n, 1)] = stats_ref[pl.ds(n, 1)] + st[None]
            cp_out = pltpu.make_async_copy(
                tout, o_hbm.at[n, pl.ds(h, 1)], t_sem.at[0])
            cp_out.start()
            cp_out.wait()
            return _

        jax.lax.fori_loop(0, n_imgs, tail_loop, None)

    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((2, bi + 1, w_in, c_in), xa_hbm.dtype),
        ybuf=pltpu.VMEM((2, bi, wp8_out, c_out), o_hbm.dtype),
        tin=pltpu.VMEM((1, w_in, c_in), xa_hbm.dtype),
        tout=pltpu.VMEM((1, wp8_out, c_out), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
        t_sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("wp8_out", "bi", "interpret",
                                             "want_stats"))
def _pad11_cat_call(xa, xb, w, b, *, wp8_out, bi, interpret=False,
                    want_stats=False):
    n, h, w_in, ca = xa.shape
    cb = xb.shape[-1]
    c_out = w.shape[-1]
    kern = functools.partial(
        _pad11_cat_kernel, n_imgs=n, bi=bi, n_blocks=h // bi, w_in=w_in,
        wp8_out=wp8_out, ca=ca, cb=cb, c_out=c_out, fused=want_stats)
    out_shape = jax.ShapeDtypeStruct((n, h + 1, wp8_out, c_out), xa.dtype)
    out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
    if want_stats:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 16, c_out), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(xa, xb, w, b)


def pconv_pad11_cat(xa, xb, w, b=None, *, interpret=None,
                    want_stats=False):
    """Fused concat+pad11: equals pconv_pad11(concat([xa, xb], -1), w, b)
    — aligned-packed xa (N, h, w, Ca) and xb (N, h, w, Cb), packed
    weights w (2, 2, Ca+Cb, Co) whose input channels are ordered
    [xa-packed, xb-packed] (pack_conv_weights with in_splits in that
    order) -> offset (N, h+1, wp8, Co), wp8 = round_up(w + 1, 8), cols
    > w exact zeros. The concatenated tensor is never materialized in
    HBM. Returns None when the shape isn't covered.

    want_stats: additionally rim-mask the output IN-KERNEL (equals
    _mask_offset of the plain output — no downstream mask pass needed)
    and return (y, stats) with stats (N, 16, Co) fp32 moment partials of
    the stored value (pack2d.norm_scale_shift_from_stats finalizes) —
    the pallas_conv="fused" producer contract."""
    n, h, w_in, ca = xa.shape
    cb = xb.shape[-1]
    c_out = w.shape[-1]
    if (xb.shape[:3] != (n, h, w_in) or xa.dtype != xb.dtype
            or w.shape[2] != ca + cb):
        return None
    if w_in % 8 or ca % 128 or cb % 128 or c_out % 128:
        return None
    wp8_out = -(-(w_in + 1) // 8) * 8
    itemsize = 2 if xa.dtype in (jnp.bfloat16, jnp.float16) else 4
    bi = _pick_bi(h, max(w_in, wp8_out), ca + cb, wp8_out, c_out,
                  itemsize=itemsize)
    if bi is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias = (jnp.zeros((1, 1, c_out), xa.dtype) if b is None
            else jnp.asarray(b, xa.dtype).reshape(1, 1, -1))
    return _pad11_cat_call(xa, xb, jnp.asarray(w, xa.dtype), bias,
                           wp8_out=wp8_out, bi=bi,
                           interpret=bool(interpret),
                           want_stats=want_stats)


# ------------------------------------------------------------- kd=3 VALID

def _valid3_kernel(x_hbm, w_ref, b_ref, *rest, n_b, n_z, bi, n_blocks,
                   w_out, c_out, co_tile, pre=False, want_stats=False,
                   slope=0.0):
    """offset (B, D, hp, wp8, Ci) -> aligned (B, D, hp-1, w_out, Co) with
    SAME z-padding: out[z] = sum_{u in -1,0,1} sum_{s,t}
    x[z+u, r+s, c+t] @ W[u+1, s, t].

    Loop: segments = (b, h-block); within a segment z runs 0..D-1 with a
    4-slot rotating slab buffer (slabs z-1, z, z+1 resident, z+2 in
    flight) — each slab is DMA'd exactly ONCE per segment. Edge z taps
    multiply by a 0/1 scalar (the slot then holds stale-but-finite data;
    slot 3 is memset once for the very first segment). Co is tiled so the
    fp32 accumulator fits VMEM at 512x512 lanes.

    pre / want_stats: the deferred-norm contract (_valid_fused_kernel
    docstring) — each slab gets rim_mask * leaky(x*sa + ta) IN PLACE
    right after its (single) DMA wait (sa/ta here are per-BATCH (B, 8,
    Ci): instance norm spans the z axis); moment partials of the stored
    aligned output accumulate per (b, z) image into (B*D, 16, Co).
    """
    k = 0
    if pre:
        sa_ref, ta_ref = rest[0], rest[1]
        k = 2
    o_hbm = rest[k]
    stats_ref = rest[k + 1] if want_stats else None
    n_seg = n_b * n_blocks
    n_co = c_out // co_tile
    hp_in = n_blocks * bi + 1
    tw_in = w_out + 1

    def body(xbuf, ybuf, in_sem, out_sem):
        def fetch(slot, b, z, blk):
            return pltpu.make_async_copy(
                x_hbm.at[b, z, pl.ds(blk * bi, bi + 1)], xbuf.at[slot],
                in_sem.at[slot])

        def out_dma(slot, b, z, blk):
            return pltpu.make_async_copy(
                ybuf.at[slot], o_hbm.at[b, z, pl.ds(blk * bi, bi)],
                out_sem.at[slot])

        def transform(slot, b, blk):
            if not pre:
                return
            x = xbuf[slot]                        # (bi+1, wp8, Ci)
            wp8, c_in = x.shape[1], x.shape[2]
            sa = sa_ref[pl.ds(b, 1), 0].reshape(1, 1, c_in)
            ta = ta_ref[pl.ds(b, 1), 0].reshape(1, 1, c_in)
            x = x * sa + ta
            x = jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))
            xbuf[slot] = x * _offset_mask(blk * bi, bi + 1, hp_in, tw_in,
                                          wp8, c_in, x.dtype)

        # slots that a short-D segment may read before any fetch writes
        # them (z-1 tap at z=0 is slot 3; D<=2 never fetches slots 1/2):
        # their gate scalar is 0, but 0 * uninitialized could be 0 * NaN
        xbuf[1] = jnp.zeros_like(xbuf[1])
        xbuf[2] = jnp.zeros_like(xbuf[2])
        xbuf[3] = jnp.zeros_like(xbuf[3])

        def seg_body(seg, _):
            b = seg // n_blocks
            blk = seg % n_blocks
            fetch(0, b, 0, blk).start()

            @pl.when(jnp.asarray(n_z > 1))
            def _():
                fetch(1, b, 1, blk).start()

            def z_body(z, _):
                @pl.when(z + 2 < n_z)
                def _():
                    fetch((z + 2) % 4, b, z + 2, blk).start()

                @pl.when(z == 0)
                def _():
                    fetch(0, b, 0, blk).wait()
                    transform(0, b, blk)

                @pl.when((z + 1 < n_z) & (z + 1 >= 1))
                def _():
                    fetch((z + 1) % 4, b, z + 1, blk).wait()
                    transform((z + 1) % 4, b, blk)

                prev_ok = (z > 0).astype(jnp.float32)
                next_ok = (z + 1 < n_z).astype(jnp.float32)
                slabs = [xbuf[(z - 1) % 4], xbuf[z % 4], xbuf[(z + 1) % 4]]
                gates = [prev_ok, jnp.float32(1.0), next_ok]

                # the ybuf slot may still drain from 2 z-steps ago — wait
                # BEFORE overwriting it below
                @pl.when(z >= 2)
                def _():
                    out_dma(z % 2, b, z - 2, blk).wait()

                for ct in range(n_co):
                    acc = jnp.zeros((bi, w_out, co_tile), jnp.float32)
                    for u in range(3):
                        x = slabs[u]
                        g = gates[u]
                        for s in (0, 1):
                            for t in (0, 1):
                                xs = x[s:s + bi, t:t + w_out, :]
                                d = jax.lax.dot_general(
                                    xs, w_ref[u, s, t, :,
                                              ct * co_tile:
                                              (ct + 1) * co_tile],
                                    dimension_numbers=(((2,), (0,)),
                                                       ((), ())),
                                    preferred_element_type=jnp.float32)
                                acc = acc + d * g
                    bslice = b_ref[0, 0, ct * co_tile:(ct + 1) * co_tile]
                    y = acc + bslice.astype(jnp.float32)
                    ybf = y.astype(ybuf.dtype)
                    ybuf[z % 2, :, :, ct * co_tile:(ct + 1) * co_tile] = ybf
                    if want_stats:
                        st = _stats16(ybf.astype(jnp.float32))
                        img = b * n_z + z
                        lo, hi = ct * co_tile, (ct + 1) * co_tile

                        @pl.when(blk == 0)
                        def _(st=st, lo=lo, hi=hi, img=img):
                            stats_ref[pl.ds(img, 1), :, lo:hi] = st[None]

                        @pl.when(blk != 0)
                        def _(st=st, lo=lo, hi=hi, img=img):
                            stats_ref[pl.ds(img, 1), :, lo:hi] = \
                                stats_ref[pl.ds(img, 1), :, lo:hi] + st[None]

                out_dma(z % 2, b, z, blk).start()
                return _

            jax.lax.fori_loop(0, n_z, z_body, None)
            out_dma((n_z - 1) % 2, b, n_z - 1, blk).wait()

            @pl.when(jnp.asarray(n_z >= 2))
            def _():
                out_dma((n_z - 2) % 2, b, n_z - 2, blk).wait()

            return _

        jax.lax.fori_loop(0, n_seg, seg_body, None)

    wp8, c_in = x_hbm.shape[3], x_hbm.shape[4]
    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((4, bi + 1, wp8, c_in), x_hbm.dtype),
        ybuf=pltpu.VMEM((2, bi, w_out, c_out), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((4,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("w_out", "bi", "co_tile",
                                             "interpret", "want_stats",
                                             "slope", "has_pre"))
def _valid3_call(x, w, b, sa, ta, *, w_out, bi, co_tile, interpret=False,
                 want_stats=False, slope=0.0, has_pre=False):
    n_b, n_z, hp, wp8, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - 1
    kern = functools.partial(
        _valid3_kernel, n_b=n_b, n_z=n_z, bi=bi, n_blocks=h // bi,
        w_out=w_out, c_out=c_out, co_tile=co_tile, pre=has_pre,
        want_stats=want_stats, slope=slope)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = (x, w, b)
    if has_pre:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += (sa, ta)
    out_shape = jax.ShapeDtypeStruct((n_b, n_z, h, w_out, c_out), x.dtype)
    out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
    if want_stats:
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (n_b * n_z, 16, c_out), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern, out_shape=out_shape, in_specs=in_specs,
        out_specs=out_specs, interpret=interpret)(*args)


def pconv3_valid(x, w, b=None, *, w_out=None, interpret=None, pre=None,
                 want_stats=False):
    """Offset-packed x (B, D, hp, wp8, 4Ci) (wp8 % 8 == 0, pad columns
    zero/ignored), packed weights w (3, 2, 2, 4Ci, Co) from
    pack_conv_weights of a (3,3,3) kernel -> aligned
    (B, D, hp-1, w_out, Co), z-SAME, bias folded. Equals
    conv_packed(x_true, w, b, hw_pad="valid") on the true wp = w_out + 1
    columns. Returns None when the shape isn't covered.

    pre=(sa, ta, slope) / want_stats: the deferred-norm contract (see
    pconv_valid) — sa/ta here are per-BATCH (B, 8, 4Ci), since instance
    norm spans the z axis this kernel keeps explicit; stats come back per
    (b, z) image as (B*D, 16, Co)."""
    n_b, n_z, hp, wp8, c_in = x.shape
    c_out = w.shape[-1]
    if w_out is None:
        w_out = wp8 - 8 if wp8 % 16 == 0 else wp8 - 1
    if (wp8 % 8 or w_out % 8 or w_out + 1 > wp8 or c_in % 128
            or c_out % 128 or w.shape[0] != 3):
        return None
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4

    def fits(bi, co_tile):
        slabs = 4 * (bi + 1) * wp8 * c_in * itemsize
        wts = 12 * c_in * c_out * itemsize
        acc = bi * w_out * co_tile * 4
        ybuf = 2 * bi * w_out * c_out * itemsize
        stats = (n_b * n_z * 16 * c_out * 4) if want_stats else 0
        return slabs + wts + acc + ybuf + stats < (
            _FUSED_VMEM_BUDGET if (pre is not None or want_stats)
            else _VMEM_BUDGET)

    pick = None
    for bi in (16, 8, 4, 2):
        if (hp - 1) % bi:
            continue
        for co_tile in (c_out, c_out // 2, c_out // 4):
            if co_tile % 128 == 0 and fits(bi, co_tile):
                pick = (bi, co_tile)
                break
        if pick:
            break
    if pick is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias = (jnp.zeros((1, 1, c_out), x.dtype) if b is None
            else jnp.asarray(b, x.dtype).reshape(1, 1, -1))
    if pre is not None:
        sa, ta, slope = pre
        sa = jnp.asarray(sa, x.dtype)
        ta = jnp.asarray(ta, x.dtype)
        has_pre = True
    else:
        sa = ta = jnp.zeros((1, 8, c_in), x.dtype)
        slope = 0.0
        has_pre = False
    return _valid3_call(x, jnp.asarray(w, x.dtype), bias, sa, ta,
                        w_out=w_out, bi=pick[0], co_tile=pick[1],
                        interpret=bool(interpret), want_stats=want_stats,
                        slope=float(slope), has_pre=has_pre)
