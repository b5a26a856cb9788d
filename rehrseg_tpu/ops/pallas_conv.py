"""Pallas TPU kernel: fused (2,2) VALID packed conv + bias.

The hot op of the packed eval path (models/segnet_packed.py) is the
offset->aligned (2,2) cell conv at C=128 lanes — 4 shifted (M,128)@(128,128)
matmuls per output block. XLA's conv emitter reaches ~49 raw TFLOP/s on it
(experiments/conv_micro2.py) vs an 88 TFLOP/s matmul peak; this kernel
streams row-blocks HBM->VMEM with double-buffered DMAs (in AND out) and
feeds the MXU 4 dots per block with an fp32 accumulator, fusing the bias.

STATUS: exact-parity verified in interpret mode (tests/test_pallas_conv.py)
but NOT wired into the hot path. Mosaic rejects the current formulation on
real TPUs: manual DMA slices must be 8-aligned along the sublane (width)
dim, and offset-packed tensors have odd widths (w+1 = 193 at the bench
geometry) — "Slice shape along dimension 2 must be aligned to tiling (8),
but is 17". Fixing it requires width-padding the activation, i.e. exactly
the standalone layout pass (24-38 ms) the kernel exists to avoid, which
would hand the advantage back to XLA's conv (49-80 raw TFLOP/s on these
shapes, docs/BENCHMARKS.md round 2). Revisit if Mosaic gains unaligned
sub-row DMA or if the packed layout moves to width-padded cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, o_hbm, *, n_imgs, n_blocks, bi, wp, c_in,
            c_out):
    wout = wp - 1
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
            x = xbuf[slot]                     # (bi+1, wp, C)
            acc = jnp.zeros((bi * wout, c_out), jnp.float32)
            for s in (0, 1):
                for t in (0, 1):
                    xs = x[s:s + bi, t:t + wout, :].reshape(bi * wout, c_in)
                    acc = acc + jnp.dot(xs, w_ref[s, t],
                                        preferred_element_type=jnp.float32)
            y = (acc + b_ref[0].astype(jnp.float32)).reshape(bi, wout, c_out)

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

    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((2, bi + 1, wp, c_in), x_hbm.dtype),
        ybuf=pltpu.VMEM((2, bi, wp - 1, c_out), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _pick_bi(h: int) -> int | None:
    for bi in (16, 20, 8, 10, 32, 4, 5, 2):
        if h % bi == 0:
            return bi
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv2x2_call(x, w, b, *, interpret=False):
    n, hp, wp, c_in = x.shape
    c_out = w.shape[-1]
    h = hp - 1
    bi = _pick_bi(h)
    kern = functools.partial(_kernel, n_imgs=n, n_blocks=h // bi, bi=bi,
                             wp=wp, c_in=c_in, c_out=c_out)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, wp - 1, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (1, C)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # written via DMA
        interpret=interpret,
    )(x, w, b)


def conv2x2_valid_bias(x: jnp.ndarray, w: jnp.ndarray, b=None, *,
                       interpret: bool = False):
    """(N, h+1, w+1, Ci) offset-packed x, (2, 2, Ci, Co) packed weights ->
    (N, h, w, Co), VALID, + bias. Returns None when the shape isn't
    covered (caller falls back to the XLA conv)."""
    n, hp, wp, c_in = x.shape
    if _pick_bi(hp - 1) is None or c_in % 128 or w.shape[-1] % 128:
        return None
    bias = (jnp.zeros((1, w.shape[-1]), x.dtype) if b is None
            else jnp.asarray(b, x.dtype).reshape(1, -1))
    return _conv2x2_call(x, jnp.asarray(w, x.dtype), bias,
                         interpret=interpret)
