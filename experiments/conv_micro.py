"""Microbenchmark: conv formulations for the sliding-window eval hot path.

Round-1 finding (docs/BENCHMARKS.md): XLA's TPU conv emitter runs the
high-res C=32 stages of SegModel at ~15 TFLOP/s — the floor behind the
34 TFLOP/s whole-model rate. Hypothesis (VERDICT round 1, next-step 2a):
space-to-depth packing 2x2 in-plane pixels into channels (C=32 -> 128 lanes)
lets the same math run as C>=128 convs at several-fold higher MXU
utilization AND removes the 4x lane padding that OOMs TTA-batch 16.

This script measures raw wall-clock + achieved TFLOP/s of each candidate on
the real chip. "eq_flops" is the FLOP count of the UNPACKED op the candidate
replaces, so "eq_tflops" numbers are directly comparable as end-to-end
speedup factors.

Run (real TPU, first compile of each graph takes minutes through the
tunnel):  python experiments/conv_micro.py
"""

import time
import json

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def conv(x, w, strides=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    B = 8
    results = {}

    def bench(name, x_shape, k_shape, eq_flops, strides=(1, 1, 1), pad="SAME"):
        x = jnp.asarray(rng.normal(size=x_shape), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=k_shape) * 0.05, jnp.bfloat16)

        @jax.jit
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=strides, padding=pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.bfloat16)

        dt = timeit(f, x, w)
        raw_flops = (np.prod(f(x, w).shape) * np.prod(k_shape[:3]) *
                     k_shape[3] * 2)
        r = dict(ms=dt * 1e3, raw_tflops=raw_flops / dt / 1e12,
                 eq_tflops=eq_flops / dt / 1e12)
        results[name] = r
        print(f"{name:42s} {r['ms']:8.2f} ms  raw {r['raw_tflops']:6.1f} "
              f"eq {r['eq_tflops']:6.1f} TFLOP/s", flush=True)

    # --- stage0 conv2 equivalents: (1,3,3) C32->C32 @ (16,320,384) ---
    eq0 = B * 16 * 320 * 384 * 9 * 32 * 32 * 2
    bench("s0 baseline (1,3,3) c32 @320x384", (B, 16, 320, 384, 32),
          (1, 3, 3, 32, 32), eq0)
    # offset-packed exact equivalent: (1,2,2) c128 @160x192, VALID-ish
    bench("s0 packed   (1,2,2) c128 @160x192", (B, 16, 161, 193, 128),
          (1, 2, 2, 128, 128), eq0, pad="VALID")
    # lazy-packed (3x3 packed cells, 4x flops)
    bench("s0 packed   (1,3,3) c128 @160x192", (B, 16, 160, 192, 128),
          (1, 3, 3, 128, 128), eq0)

    # --- stage1 conv2 equivalents: (3,3,3) C64->C64 @ (16,160,192) ---
    eq1 = B * 16 * 160 * 192 * 27 * 64 * 64 * 2
    bench("s1 baseline (3,3,3) c64 @160x192", (B, 16, 160, 192, 64),
          (3, 3, 3, 64, 64), eq1)
    bench("s1 packed   (3,2,2) c256 @80x96", (B, 16, 81, 97, 256),
          (3, 2, 2, 256, 256), eq1, pad="VALID")

    # --- decoder half-res conv1: (3,3,3) C128->C64 @ (16,160,192) ---
    eqd = B * 16 * 160 * 192 * 27 * 128 * 64 * 2
    bench("dec baseline (3,3,3) c128->64 @160x192", (B, 16, 160, 192, 128),
          (3, 3, 3, 128, 64), eqd)
    bench("dec packed  (3,2,2) c512->256 @80x96", (B, 16, 81, 97, 512),
          (3, 2, 2, 512, 256), eqd, pad="VALID")

    # --- reference rates ---
    eq2 = B * 8 * 80 * 96 * 27 * 128 * 128 * 2
    bench("s2 ref      (3,3,3) c128 @80x96", (B, 8, 80, 96, 128),
          (3, 3, 3, 128, 128), eq2)

    x = jnp.asarray(rng.normal(size=(B * 16 * 160 * 192 // 128, 512)),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(512, 512)) * 0.05, jnp.bfloat16)

    @jax.jit
    def mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

    dt = timeit(mm, x, w)
    tf = 2 * x.shape[0] * 512 * 512 / dt / 1e12
    results["matmul 512x512 peak probe"] = dict(ms=dt * 1e3, raw_tflops=tf,
                                                eq_tflops=tf)
    print(f"{'matmul 512x512 peak probe':42s} {dt*1e3:8.2f} ms  "
          f"raw {tf:6.1f} TFLOP/s", flush=True)

    with open("/tmp/conv_micro.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
