"""Micro A/B for the decoder-concat fusion (round 5, follow-up to the
engine op profile): the aligned engine's single largest non-conv op is
the full-res decoder skip CONCAT (pad_maximum_fusion at
segnet_packed.py:399 — 73.5 ms/volume, 5.2% of device time), and the
conv that consumes it is the pad11 class where pconv_pad11 already wins
+19% micro. This probe times the three ways to run that site, plus the
three ways the NEXT conv can consume the widened (200-wide) offset
output the Pallas kernel emits:

site A — concat + conv_0 (aligned c128+c128 -> offset c128, (160,192)):
  a. concat -> XLA conv_packed pad11         (current engine)
  b. concat -> pconv_pad11                   (kernel, concat still paid)
  c. pconv_pad11_cat(xa, xb)                 (fused: no concat tensor)

site B — conv_1 (offset c128 -> aligned c128) on a 200-wide input whose
true width is 193 (cols 193.. are exact zeros):
  a. strip copy then exact conv              (x[:, :, :, :193])
  b. negative right padding inside the conv  (reads only true cols)
  c. full-width conv + output slice          (+3.6% FLOPs, junk cols cut)
  r. exact-width input                       (reference, no widening)

Timing: chained-dispatch differencing (see pconv_probe.chain_time —
weight-carried epsilon, scalar fetch). Run on the real TPU:
    python experiments/pconv_cat_probe.py

HARNESS CAVEAT (learned from the first capture): loop-INVARIANT input
transformations — the concat in A/a-b, the strip slice in B/a — depend
only on x, so XLA CSEs them across the chain's links and the
differencing cancels them: those rows time the CONV ONLY. The concat's
true per-tile cost is carried by the engine op profile instead
(pad_maximum_fusion 73.5 ms/volume, engine_op_profile.py), and the
strip's by the B/a-vs-B/r delta being ~0 here while a standalone strip
copy moves ~1 GB/tile. Rows where the transformation lives INSIDE the
conv (B/b negative pad, B/c widened conv) and the Pallas rows (A/c, the
kernel re-reads its inputs every link) are not affected. The decision
metric is the ENGINE A/B (aligned_engine_bench.py cat), not this probe.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.pack2d import conv_packed, pack_conv_weights, pack_bias
from rehrseg_tpu.ops.pallas_pconv import pconv_pad11, pconv_pad11_cat

from pconv_probe import chain_time, report, B, D, N


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.key(0)

    # ---------------- site A: concat + pad11 c128+c128 -> c128 @ (160,192)
    ci, co = 64, 32                               # 256 lanes in, 128 out
    w3 = jax.random.normal(key, (1, 3, 3, ci, co), jnp.bfloat16) * 0.05
    wpk = pack_conv_weights(w3, in_splits=[32, 32])
    b = pack_bias(jax.random.normal(key, (co,), jnp.bfloat16) * 0.1)
    flops = 2 * N * 161 * 193 * 4 * (4 * ci) * (4 * co)

    xa5 = jax.random.normal(key, (B, D, 160, 192, 128), jnp.bfloat16)
    xb5 = jax.random.normal(key, (B, D, 160, 192, 128), jnp.bfloat16)

    t = chain_time(
        lambda x, w, bb: conv_packed(jnp.concatenate(x, -1), w, bb,
                                     hw_pad="pad11"),
        (xa5, xb5), wpk, b)
    report("A/a concat + XLA pad11   ", t, flops)

    xa4 = xa5.reshape(N, 160, 192, 128)
    xb4 = xb5.reshape(N, 160, 192, 128)
    t = chain_time(
        lambda x, w, bb: pconv_pad11(jnp.concatenate(x, -1), w, bb),
        (xa4, xb4), wpk[0], b)
    report("A/b concat + pconv_pad11 ", t, flops)

    t = chain_time(
        lambda x, w, bb: pconv_pad11_cat(x[0], x[1], w, bb),
        (xa4, xb4), wpk[0], b)
    report("A/c pconv_pad11_cat      ", t, flops)

    # ---------------- site B: offset c128 -> aligned c128, widened input
    ci2, co2 = 32, 32
    w3b = jax.random.normal(key, (1, 3, 3, ci2, co2), jnp.bfloat16) * 0.05
    wpk2 = pack_conv_weights(w3b)
    b2 = pack_bias(jax.random.normal(key, (co2,), jnp.bfloat16) * 0.1)
    flops2 = 2 * N * 160 * 192 * 4 * (4 * ci2) * (4 * co2)

    xw = jax.random.normal(key, (B, D, 161, 200, 4 * ci2), jnp.bfloat16)
    xw = xw.at[:, :, :, 193:].set(0)

    t = chain_time(
        lambda x, w, bb: conv_packed(x[:, :, :, :193], w, bb), xw, wpk2, b2)
    report("B/a strip copy + conv    ", t, flops2)

    def negpad(x, w, bb):
        bsz, d, hp, wp_, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(bsz * d, hp, wp_, c), w[0], window_strides=(1, 1),
            padding=((0, 0), (0, 193 - wp_)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y.reshape(bsz, d, *y.shape[1:]) + bb

    t = chain_time(negpad, xw, wpk2, b2)
    report("B/b negative-pad conv    ", t, flops2)

    t = chain_time(
        lambda x, w, bb: conv_packed(x, w, bb)[:, :, :, :192], xw, wpk2, b2)
    report("B/c full-width + slice   ", t, flops2)

    x193 = jax.random.normal(key, (B, D, 161, 193, 4 * ci2), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: conv_packed(x, w, bb), x193, wpk2, b2)
    report("B/r exact-width reference", t, flops2)


if __name__ == "__main__":
    main()
