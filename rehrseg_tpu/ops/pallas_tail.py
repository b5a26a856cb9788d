"""Pallas TPU kernel: fused mirror-TTA unmirror + mean + gaussian-weight +
accumulate for the sliding-window engine tail.

The XLA scan tail (mirror build, unmirror-mean, gaussian-mul,
dynamic_update_slice accumulate) costs ~10-12 ms/tile at the bench geometry
— 10% of device time (docs/BENCHMARKS.md round 3; experiments/tail_fuse.py)
— because each piece is its own HBM pass and the accumulate offsets of the
reference tile grid fall on unaligned lanes. This kernel does the whole
tail in ONE pass over the predictions:

    logits[c, zo+d, sy:sy+ph, sz:sz+pw] +=
        (1/8) * gaussian[d] * sum_i unflip_i(preds[i, c, d_i])

Layout contract (the "aligned" engine mode, infer/sliding_window.py):

  - preds are per-class PLANES (n_tta, C, od, ph, pw) — lane dim is W
    (128-multiple), sublane is H (8-multiple); the packed model emits this
    at no extra cost (the final depth_to_space runs per class);
  - the TTA combo order is Z-GROUPED: [(), h, w, hw, z, zh, zw, zhw] —
    the first 4 need plane d, the last 4 plane od-1-d, so each (c, d)
    step is exactly two contiguous (4, ph, pw) DMAs;
  - the logits accumulator is (C, D, H, W) fp32 with tile starts sy % 8
    == 0 and sz % 128 == 0 (the aligned tile grid) — Mosaic's DMA
    alignment rules hold by construction, which is what blocked the
    round-2/3 Pallas attempts at reference-parity offsets
    (ops/pallas_conv.py docstring).

H/W unflips are sublane/lane reversals done on the VPU via jnp.flip; the
z unflip is pure index math (d_i = od-1-d). Exactness vs the XLA tail is
pinned by tests/test_pallas_tail.py (interpret mode on CPU, and the same
test runs on real TPU when one is attached).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def zgrouped_combos():
    """Mirror combos ordered so the z-flip bit is the high bit:
    [(), (1,), (2,), (1,2), (0,), (0,1), (0,2), (0,1,2)] over tile axes
    (z, h, w) = (0, 1, 2). unflip == flip for reflections, so the kernel
    applies the same (h, w) pattern [none, h, w, hw] to each half."""
    return [(), (1,), (2,), (1, 2), (0,), (0, 1), (0, 2), (0, 1, 2)]


def _pick_dp(od: int, ph: int, pw: int, itemsize: int = 2) -> int:
    """z-planes per pipeline step: 2 when the double-buffered working set
    fits the ~16 MB/core VMEM (measured: dp=2 at (320, 384) planes wants
    18 MB and Mosaic refuses), else 1. itemsize = preds/gaussian dtype
    bytes (2 for the bf16 production path; fp32 callers double these
    slots and must not be sized as if they were bf16)."""
    if od % 2:
        return 1
    plane = ph * pw
    est = (2 * 2 * (4 * 2 * plane * itemsize)  # pa + pb, 2 slots
           + 2 * 2 * plane * itemsize          # gaussian, 2 slots
           + 2 * 2 * plane * 4                 # accumulator, 2 slots, fp32
           + (ph * ph + pw * pw) * itemsize    # reversal matrices
           + 6 * plane * 4)                    # live fp32 temporaries
    return 2 if est <= 12 * 1024 * 1024 else 1


def _kernel(off_ref, preds_hbm, g_hbm, ph_rev, pw_rev, acc_hbm, out_hbm, *,
            od, ph, pw, n_classes, z_scale):
    # offsets arrive BLOCK-granular (sy/8, sz/128): multiplying by the
    # tiling constants here lets Mosaic PROVE the slice offsets are
    # tile-aligned — a raw dynamic i32 fails with "Failed to prove that a
    # tile index ... is divisible by the tiling (8)"
    sx = off_ref[0]
    sy = off_ref[1] * 8
    sz = off_ref[2] * 128
    valid = off_ref[3]
    # DP z-planes per pipeline step (fewer, larger DMAs — per-descriptor
    # latency dominates 245 KB copies); step = k * n_classes + c so the
    # gaussian block is fetched once per k and reused across classes
    dp = _pick_dp(od, ph, pw, np.dtype(preds_hbm.dtype).itemsize)
    n_k = od // dp
    total = n_k * n_classes

    def body(pa, pb, gbuf, abuf, in_sem, g_sem, acc_in_sem, out_sem):
        def step_kc(step):
            return step // n_classes, step % n_classes

        def in_dma(slot, step):
            k, c = step_kc(step)
            return (
                pltpu.make_async_copy(
                    preds_hbm.at[pl.ds(0, 4), c, pl.ds(k * dp, dp)],
                    pa.at[slot], in_sem.at[slot, 0]),
                # z-flip partners of local planes j=0..dp-1 are global
                # planes od-1-(k*dp+j): one contiguous block in REVERSED
                # local order (partner of j sits at index dp-1-j)
                pltpu.make_async_copy(
                    preds_hbm.at[pl.ds(4, 4), c,
                                 pl.ds(od - (k + 1) * dp, dp)],
                    pb.at[slot], in_sem.at[slot, 1]),
            )

        def g_dma(slot, k):
            return pltpu.make_async_copy(g_hbm.at[pl.ds(k * dp, dp)],
                                         gbuf.at[slot], g_sem.at[slot])

        def acc_slice(step):
            k, c = step_kc(step)
            zo = sx * z_scale + k * dp
            return (c, pl.ds(zo, dp), pl.ds(sy, ph), pl.ds(sz, pw))

        def acc_in_dma(slot, step):
            return pltpu.make_async_copy(acc_hbm.at[acc_slice(step)],
                                         abuf.at[slot], acc_in_sem.at[slot])

        def acc_out_dma(slot, step):
            return pltpu.make_async_copy(abuf.at[slot],
                                         out_hbm.at[acc_slice(step)],
                                         out_sem.at[slot])

        for dma in in_dma(0, 0):
            dma.start()
        g_dma(0, 0).start()

        def loop(step, _):
            slot = step % 2
            k, c = step_kc(step)

            # prefetch next step's preds (their slot was last READ during
            # step-1's compute, which has completed) and, on the last class
            # of each k, the next k's gaussian block. The acc buffer is NOT
            # prefetched — its slot may still be draining to HBM.
            @pl.when(step + 1 < total)
            def _():
                for dma in in_dma((step + 1) % 2, step + 1):
                    dma.start()

            @pl.when((c == n_classes - 1) & (k + 1 < n_k))
            def _():
                g_dma((k + 1) % 2, k + 1).start()

            for dma in in_dma(slot, step):
                dma.wait()

            @pl.when(c == 0)
            def _():
                g_dma(k % 2, k).wait()

            # Mosaic has no `rev` lowering: H/W reversals run as exact
            # permutation matmuls on the (otherwise idle) MXU — flip
            # along sublanes is Ph @ x, along lanes is x @ Pw. Each bf16
            # half is flipped separately with fp32 accumulation, so the
            # result is bit-comparable to the XLA tail (a bf16 pre-add
            # would inject ~1e-3 rounding).
            a = pa[slot]                 # (4, dp, ph, pw): [id, h, w, hw]
            b = pb[slot]                 # z-flipped half, reversed d order
            Ph, Pw = ph_rev[...], pw_rev[...]

            # Mosaic requires 32-bit matmul accumulators, so the
            # permutation dots emit fp32 (still exact: a permutation of
            # bf16 values is representable in fp32)
            def hflip(x):
                return jnp.dot(Ph, x, preferred_element_type=jnp.float32)

            def wflip(x):
                return jnp.dot(x, Pw, preferred_element_type=jnp.float32)

            scale = valid.astype(jnp.float32) * 0.125

            # the out-DMA from 2 steps ago may still be draining this slot
            @pl.when(step >= 2)
            def _():
                acc_out_dma(slot, step - 2).wait()

            # start the accumulator read NOW so it overlaps the flip math
            acc_in_dma(slot, step).start()
            contribs = []
            for j in range(dp):
                aj = a[:, j]
                bj = b[:, dp - 1 - j]
                u = aj[0].astype(jnp.float32) + bj[0].astype(jnp.float32)
                u = u + hflip(aj[1])
                u = u + hflip(bj[1])
                u = u + wflip(aj[2])
                u = u + wflip(bj[2])
                u = u + hflip(wflip(aj[3]).astype(a.dtype))
                u = u + hflip(wflip(bj[3]).astype(b.dtype))
                contribs.append(
                    u * (gbuf[k % 2, j].astype(jnp.float32) * scale))
            acc_in_dma(slot, step).wait()
            for j in range(dp):
                abuf[slot, j] = abuf[slot, j] + contribs[j]
            acc_out_dma(slot, step).start()
            return _

        jax.lax.fori_loop(0, total, loop, None)
        acc_out_dma((total - 1) % 2, total - 1).wait()

        @pl.when(jnp.asarray(total >= 2))
        def _():
            acc_out_dma((total - 2) % 2, total - 2).wait()

    pl.run_scoped(
        body,
        pa=pltpu.VMEM((2, 4, dp, ph, pw), preds_hbm.dtype),
        pb=pltpu.VMEM((2, 4, dp, ph, pw), preds_hbm.dtype),
        gbuf=pltpu.VMEM((2, dp, ph, pw), g_hbm.dtype),
        abuf=pltpu.VMEM((2, dp, ph, pw), jnp.float32),
        in_sem=pltpu.SemaphoreType.DMA((2, 2)),
        g_sem=pltpu.SemaphoreType.DMA((2,)),
        acc_in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit,
                   static_argnames=("z_scale", "interpret"))
def accumulate_tta_tile(logits, preds, gaussian, offsets, *, z_scale=1,
                        interpret=False):
    """Fused unmirror+mean+gauss+accumulate of one tile's TTA predictions.

    logits   (C, D, H, W) fp32 accumulator (donated/aliased);
    preds    (8, C, od, ph, pw) — z-grouped combo order (zgrouped_combos);
    gaussian (od, ph, pw);
    offsets  (4,) int32: (sx, sy, sz, valid) with sy % 8 == 0 and
             sz % 128 == 0 (aligned tile grid); sx indexes the LR z grid,
             the write lands at sx * z_scale + [0, od). The kernel receives
             sy/8 and sz/128 so Mosaic can prove DMA tile alignment.

    Returns the updated logits (the input buffer is aliased — callers must
    treat it as consumed).
    """
    n_tta, n_classes, od, ph, pw = preds.shape
    assert n_tta == 8
    offsets = jnp.stack([offsets[0], offsets[1] // 8, offsets[2] // 128,
                         offsets[3]])
    # the gaussian rides in bf16 (halves its VMEM slots; ~0.4% rounding on
    # an importance WEIGHT — callers that compare against an XLA path must
    # round g identically, see tests/test_pallas_tail.py)
    gaussian = gaussian.astype(preds.dtype)
    # reversal permutation matrices (exact in bf16: entries are 0/1)
    ph_rev = jnp.asarray(jnp.eye(ph)[::-1], preds.dtype)
    pw_rev = jnp.asarray(jnp.eye(pw)[::-1], preds.dtype)
    kern = functools.partial(_kernel, od=od, ph=ph, pw=pw,
                             n_classes=n_classes, z_scale=z_scale)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets
            pl.BlockSpec(memory_space=pltpu.ANY),    # preds stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # gaussian
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Ph reversal
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Pw reversal
            pl.BlockSpec(memory_space=pltpu.ANY),    # logits (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        input_output_aliases={5: 0},
        interpret=interpret,
    )(offsets, preds, gaussian, ph_rev, pw_rev, logits)
