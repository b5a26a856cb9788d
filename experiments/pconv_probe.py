"""A/B: production Pallas packed conv (ops/pallas_pconv.py) vs XLA's
conv emitter on the kd=1 stride-1 (2,2) classes the packed engine runs at
bench geometry (stage-0 + full-res decoder, B=8 TTA x D=16):

  valid  c128 -> c128 @ offset (161, 193->200)   [s0 conv_1, dec conv_1]
  pad11  c256 -> c128 @ aligned (160, 192)       [dec conv_0, concat input]

Timing: ONE dispatch containing an unrolled chain of ITERS convs (the
WEIGHTS carry a loop-dependent epsilon so nothing hoists/CSEs — see
chain_time's docstring for why bias-perturbation silently CSEs the XLA
side), scalar fetch — a per-call timing loop pays the ~23 ms tunnel
round-trip per iteration and mismeasures a 4-10 ms conv by 3-6x
(bench.py peak-probe note; the first capture of this probe hit exactly
that).

Also times conv_packing emitting its offset output at width 200 vs 193
(the widened-right-pad form the Pallas-enabled engine needs upstream).

Run on the real TPU: python experiments/pconv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.pack2d import (
    conv_packed, conv_packing, pack_conv_weights,
    pack_conv_weights_from_unpacked, pack_bias)
from rehrseg_tpu.ops.pallas_pconv import pconv_valid, pconv_pad11

B, D = 8, 16
N = B * D
ITERS = 8


def chain_time(conv_xwb, x0, w0, b0, iters=ITERS, reps=5):
    """Per-conv time by DIFFERENCING two unrolled chains: one dispatch of
    K convs costs sync_overhead + K*conv; (t_K - t_1) / (K - 1) cancels
    the ~23 ms tunnel round-trip that a per-call timing loop would fold
    into every sample. A fori_loop formulation would be smaller, but its
    remote compile hangs through the tunnel (observed: >20 min, no cache
    entry).

    Two hard-won rules of this harness:
    - The activation MUST be an explicit jit argument, not a closure
      capture: jit embeds closed-over device arrays as program CONSTANTS,
      and shipping a ~1 GB constant to the tunnel's remote compile helper
      hangs it indefinitely (observed twice: >25 min, no cache entry,
      process asleep in wait_woken; the same conv with x as an argument
      compiles in 2.6 s).
    - The WEIGHTS carry the loop-dependent epsilon, not the bias: the XLA
      path adds bias OUTSIDE the conv, so bias-perturbed chains leave K
      identical convs that CSE into one (first capture read 0.00 ms XLA /
      515 PF/s), while the Pallas kernels take bias inside the kernel and
      do not CSE — an asymmetric, meaningless A/B. The epsilon
      (s * 1e-30, s ~ O(1) runtime scalar) is representable in bf16's
      fp32-range exponent but vanishes in the +0.05 add, so numerics are
      bit-identical while every conv stays data-dependent on its
      predecessor. Perturbing weights (<= 6 MB) instead of x (~1 GB) adds
      no measurable elementwise traffic."""

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
        v = fn(x0, w0, b0)
        float(v)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(x0, w0, b0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = best_of(c1), best_of(ck)
    return max((tk - t1) / (iters - 1), 1e-9)


def report(tag, best, flops):
    print(f"{tag}: {best * 1e3:7.2f} ms  {flops / best / 1e12:6.1f} TF/s",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.key(0)

    # ---------------- valid c128 -> c128 @ (161, 193/200)
    ci, co = 32, 32                               # 128 / 128 lanes
    w3 = jax.random.normal(key, (1, 3, 3, ci, co), jnp.bfloat16) * 0.05
    wpk = pack_conv_weights(w3)
    b = pack_bias(jax.random.normal(key, (co,), jnp.bfloat16) * 0.1)
    flops = 2 * N * 160 * 192 * 4 * (4 * ci) * (4 * co)

    x5 = jax.random.normal(key, (B, D, 161, 193, 4 * ci), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: conv_packed(x, w, bb), x5, wpk, b)
    report("valid c128 XLA         ", t, flops)

    x8 = jax.random.normal(key, (N, 161, 200, 4 * ci), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: pconv_valid(x, w, bb, w_out=192), x8, wpk[0], b)
    report("valid c128 Pallas      ", t, flops)

    # ---------------- valid c512 -> c512 (s2-class lanes, kd=1 form)
    ci2, co2 = 128, 128
    w3b = jax.random.normal(key, (1, 3, 3, ci2, co2), jnp.bfloat16) * 0.05
    wpk2 = pack_conv_weights(w3b)
    b2 = pack_bias(jax.random.normal(key, (co2,), jnp.bfloat16) * 0.1)
    flops2 = 2 * N * 40 * 48 * 4 * (4 * ci2) * (4 * co2)
    x5b = jax.random.normal(key, (B, D, 41, 49, 4 * ci2), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: conv_packed(x, w, bb), x5b, wpk2, b2)
    report("valid c512 XLA  (40,48)", t, flops2)
    x8b = jax.random.normal(key, (N, 41, 56, 4 * ci2), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: pconv_valid(x, w, bb, w_out=48), x8b, wpk2[0], b2)
    report("valid c512 Pallas      ", t, flops2)

    # ---------------- kd=3 valid c512 (s2 stride-1 class, (3,2,2))
    from rehrseg_tpu.ops.pallas_pconv import pconv3_valid
    w3d = jax.random.normal(key, (3, 3, 3, ci2, co2), jnp.bfloat16) * 0.05
    wpk3d = pack_conv_weights(w3d)            # (3, 2, 2, 512, 512)
    flops3d = 3 * 2 * N * 40 * 48 * 4 * (4 * ci2) * (4 * co2)
    t = chain_time(lambda x, w, bb: conv_packed(x, w, bb), x5b, wpk3d, b2)
    report("valid3 c512 XLA (40,48)", t, flops3d)
    x5c = jax.random.normal(key, (B, 16, 41, 56, 4 * ci2), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: pconv3_valid(x, w, bb, w_out=48), x5c, wpk3d, b2)
    report("valid3 c512 Pallas     ", t, flops3d)

    # kd=3 valid c256 (s1 stride-1 class) @ (81, 97->104)
    ci4 = 64
    w3e = jax.random.normal(key, (3, 3, 3, ci4, ci4), jnp.bfloat16) * 0.05
    wpk3e = pack_conv_weights(w3e)
    b4 = pack_bias(jax.random.normal(key, (ci4,), jnp.bfloat16) * 0.1)
    flops3e = 3 * 2 * N * 80 * 96 * 4 * (4 * ci4) * (4 * ci4)
    x5d = jax.random.normal(key, (B, 16, 81, 97, 4 * ci4), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: conv_packed(x, w, bb), x5d, wpk3e, b4)
    report("valid3 c256 XLA (81,97)", t, flops3e)
    x5e = jax.random.normal(key, (B, 16, 81, 104, 4 * ci4), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: pconv3_valid(x, w, bb, w_out=96), x5e, wpk3e, b4)
    report("valid3 c256 Pallas     ", t, flops3e)

    # ---------------- pad11 c256 -> c128 @ (160, 192)
    ci3 = 64                                      # 256 lanes concat
    w3c = jax.random.normal(key, (1, 3, 3, ci3, co), jnp.bfloat16) * 0.05
    wpk3 = pack_conv_weights(w3c)
    flops3 = 2 * N * 161 * 193 * 4 * (4 * ci3) * (4 * co)
    xa5 = jax.random.normal(key, (B, D, 160, 192, 4 * ci3), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: conv_packed(x, w, bb, hw_pad="pad11"), xa5, wpk3, b)
    report("pad11 c256->128 XLA    ", t, flops3)
    xa4 = jax.random.normal(key, (N, 160, 192, 4 * ci3), jnp.bfloat16)
    t = chain_time(lambda x, w, bb: pconv_pad11(x, w, bb), xa4, wpk3[0], b)
    report("pad11 c256->128 Pallas ", t, flops3)

    # ---------------- conv_packing offset emit: 193-wide vs 200-wide
    w4 = pack_conv_weights_from_unpacked(
        jax.random.normal(key, (1, 3, 3, 2, ci), jnp.bfloat16) * 0.05)
    xu = jax.random.normal(key, (B, D, 320, 384, 2), jnp.bfloat16)
    bp = pack_bias(jax.random.normal(key, (ci,), jnp.bfloat16) * 0.1)
    t = chain_time(lambda x, w, bb: conv_packing(x, w, bb, offset_out=True), xu, w4, bp)
    print(f"conv_packing ->193 wide: {t * 1e3:7.2f} ms", flush=True)

    def packing_200(x, w, bb):
        # widened right pad: out w cells = (384 + 2 + 16 - 4)//2 + 1 = 200
        bsz, d, h, w_, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(bsz * d, h, w_, c), w[0], window_strides=(2, 2),
            padding=((2, 2), (2, 16)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y.reshape(bsz, d, *y.shape[1:]) + bb

    t = chain_time(packing_200, xu, w4, bp)
    print(f"conv_packing ->200 wide: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
