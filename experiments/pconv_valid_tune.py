"""Tune the Pallas VALID packed conv on the full-res c128 class where it
loses -30% to XLA (docs/BENCHMARKS.md round-5 micro A/B: XLA 2.69 ms /
191 TF/s vs Pallas 3.86 ms / 134 TF/s at offset (161, 193->200)).

Hypothesis: the deficit is the t=1 column taps — `x[s:s+bi, t:t+w_out]`
with t=1 is a 1-sublane-shifted slice of the VMEM slab, which Mosaic
materializes as a relayout copy per dot (2 of the 4 dots pay it). The
pad11 kernel (which WINS +19%) places tap groups with concats instead of
slicing its operands, supporting the theory.

Variants measured (same chained-dispatch harness as pconv_probe.py):
  base16 : production _valid_kernel, bi=16 (the shipped kernel)
  base32 : production kernel shape, bi=32 (h=160 divides; VMEM fits)
  wide16 : one dot per row-tap s with W' = [W[s,0] | W[s,1]] (N=2co,
           full slab width, no operand slicing) then a single shifted
           f32 add acc = P[:, :w, :co] + P[:, 1:w+1, co:] — moves the
           shift from two bf16 MXU operands to one f32 VPU read and
           doubles the dot's N (128 -> 256, better MXU pipelining) at
           +4% FLOPs (wp8=200 vs w_out=192 columns).
  wide32 : wide + bi=32

Run on the real TPU: python experiments/pconv_valid_tune.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.pack2d import conv_packed, pack_conv_weights, pack_bias
from rehrseg_tpu.ops.pallas_pconv import _valid_kernel

B, D = 8, 16
N = B * D
ITERS = 8


# ---------------------------------------------------------------- kernels

def _valid_wide_kernel(x_hbm, w_ref, b_ref, o_hbm, *, n_imgs, bi, n_blocks,
                       w_out, c_out):
    """Variant: per row-tap s, ONE dot x_s @ [W[s,0] | W[s,1]] over the
    full slab width; the column taps combine afterwards as a single
    shifted f32 add. w_ref: (2, Ci, 2*Co)."""
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
            wp8 = x.shape[1]
            p = jnp.zeros((bi, wp8, 2 * c_out), jnp.float32)
            for s in (0, 1):
                p = p + jax.lax.dot_general(
                    x[s:s + bi, :, :], w_ref[s],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = p[:, :w_out, :c_out] + p[:, 1:w_out + 1, c_out:]
            y = acc + b_ref[0, 0].astype(jnp.float32)

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


@functools.partial(jax.jit, static_argnames=("w_out", "bi", "wide"))
def _call(x, w, b, *, w_out, bi, wide):
    n, hp, wp8, c_in = x.shape
    h = hp - 1
    if wide:
        c_out = w.shape[-1] // 2
        kern = functools.partial(
            _valid_wide_kernel, n_imgs=n, bi=bi, n_blocks=h // bi,
            w_out=w_out, c_out=c_out)
    else:
        c_out = w.shape[-1]
        kern = functools.partial(
            _valid_kernel, n_imgs=n, bi=bi, n_blocks=h // bi,
            w_out=w_out, c_out=c_out)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w_out, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )(x, w, b)


def chain_time(conv_xwb, x0, w0, b0, iters=ITERS, reps=5):
    """Same harness as pconv_probe.chain_time (weights carry the epsilon,
    x is an explicit arg — see that docstring for the two hard rules)."""

    def make_chain(k):
        @jax.jit
        def chain(x, w, b):
            y = conv_xwb(x, w, b)
            for _ in range(k - 1):
                s = y.astype(jnp.float32).ravel()[0]
                w = jax.tree_util.tree_map(
                    lambda a: (a + s * 1e-30).astype(a.dtype), w)
                y = conv_xwb(x, w, b)
            return y.astype(jnp.float32).ravel()[0]
        return chain

    c1, ck = make_chain(1), make_chain(iters)

    def best_of(fn):
        float(fn(x0, w0, b0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(x0, w0, b0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = best_of(c1), best_of(ck)
    return max((tk - t1) / (iters - 1), 1e-9)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.key(0)
    ci, co = 32, 32
    w3 = jax.random.normal(key, (1, 3, 3, ci, co), jnp.bfloat16) * 0.05
    wpk = pack_conv_weights(w3)                   # (1, 2, 2, 128, 128)
    b = pack_bias(jax.random.normal(key, (co,), jnp.bfloat16) * 0.1)
    b3 = b.reshape(1, 1, -1)                      # kernel-call bias layout
    flops = 2 * N * 160 * 192 * 4 * (4 * ci) * (4 * co)

    w4 = wpk[0]                                   # (2, 2, 128, 128)
    # wide form: (2, Ci, 2Co) = [W[s,0] | W[s,1]]
    wwide = jnp.concatenate([w4[:, 0], w4[:, 1]], axis=-1)

    x8 = jax.random.normal(key, (N, 161, 200, 4 * ci), jnp.bfloat16)

    # correctness pin (all variants vs XLA conv_packed on true columns)
    x5 = x8[:, :, :193, :].reshape(B, D, 161, 193, 4 * ci)
    import numpy as np
    ref = np.asarray(conv_packed(x5, wpk, b)).reshape(N, 160, 192, 128)
    for tag, args in (("base16", (w4, False, 16)), ("base32", (w4, False, 32)),
                      ("wide16", (wwide, True, 16)), ("wide32", (wwide, True, 32))):
        w_, wide, bi = args
        got = np.asarray(_call(x8, w_, b3, w_out=192, bi=bi, wide=wide))
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
        err = np.abs(got.astype(np.float32) - ref.astype(np.float32)).max()
        print(f"{tag}: matches XLA (max abs err {err:.4f})", flush=True)

    t = chain_time(lambda x, w, bb: conv_packed(
        x.reshape(B, D, *x.shape[1:]), w, bb, in_w=193).reshape(
            N, 160, 192, 128), x8, wpk, b)
    print(f"XLA (in_w=193)  : {t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TF/s",
          flush=True)

    for tag, (w_, wide, bi) in (("base16", (w4, False, 16)),
                                ("base32", (w4, False, 32)),
                                ("wide16", (wwide, True, 16)),
                                ("wide32", (wwide, True, 32))):
        t = chain_time(lambda x, w, bb, wide=wide, bi=bi: _call(
            x, w, bb, w_out=192, bi=bi, wide=wide), x8, w_, b3)
        print(f"{tag}          : {t * 1e3:7.2f} ms  "
              f"{flops / t / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
