"""Conv microbenchmark round 2: dispatch overhead, true peak, 2D
formulations, and matmul-form packed convs.

Round-2a findings (conv_micro.py): the (1,3,3) stages are catastrophically
slow as 5D convs (3.6 TF/s at C=32, raw 11-26 TF/s even packed to C=128),
while (3,3,3) stages reach raw 65-80 TF/s when packed to C>=256. The tiny
matmul probe hit 4.5 ms/call -> suspect per-dispatch tunnel overhead, and
round-1 measured the same C=32 conv at 15 TF/s in a 2D NHWC formulation.
This round isolates: (a) dispatch overhead, (b) bf16 matmul peak, (c) 2D
vs 5D emitter behavior, (d) explicit shifted-matmul packed convs.
"""

import time
import json

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


results = {}


def report(name, dt, raw_flops, eq_flops=None):
    eq = eq_flops or raw_flops
    results[name] = dict(ms=dt * 1e3, raw_tflops=raw_flops / dt / 1e12,
                         eq_tflops=eq / dt / 1e12)
    print(f"{name:44s} {dt*1e3:8.2f} ms  raw {raw_flops/dt/1e12:6.1f} "
          f"eq {eq/dt/1e12:6.1f} TFLOP/s", flush=True)


def conv2d(x, w, pad="SAME", strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # (a) dispatch overhead: trivial op, many iters
    x0 = jnp.ones((8, 128), jnp.bfloat16)
    f0 = jax.jit(lambda x: x + 1)
    dt = timeit(f0, x0, iters=50)
    print(f"dispatch overhead per call: {dt*1e3:.3f} ms", flush=True)
    results["dispatch_ms"] = dt * 1e3

    # (b) true bf16 matmul peak: 550 GFLOP
    a = jnp.asarray(rng.normal(size=(8192, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(4096, 4096)) * 0.02, jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    dt = timeit(mm, a, b, iters=16)
    report("matmul 8192x4096x4096 peak", dt, 2 * 8192 * 4096 * 4096)

    B = 8
    eq0 = B * 16 * 320 * 384 * 9 * 32 * 32 * 2  # s0 conv2 parity FLOPs

    # (c) 2D formulations of s0 conv2 (D folded into batch)
    x = jnp.asarray(rng.normal(size=(B * 16, 320, 384, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 32)) * 0.05, jnp.bfloat16)
    f = jax.jit(lambda x, w: conv2d(x, w))
    report("s0 2D (3,3) c32 @320x384 b128", timeit(f, x, w), eq0)

    xp = jnp.asarray(rng.normal(size=(B * 16, 161, 193, 128)), jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(2, 2, 128, 128)) * 0.05, jnp.bfloat16)
    f = jax.jit(lambda x, w: conv2d(x, w, pad="VALID"))
    report("s0 2D packed (2,2) c128 @160x192", timeit(f, xp, wp),
           B * 16 * 160 * 192 * 4 * 128 * 128 * 2, eq0)

    wp3 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    xp3 = jnp.asarray(rng.normal(size=(B * 16, 160, 192, 128)), jnp.bfloat16)
    f = jax.jit(lambda x, w: conv2d(x, w))
    report("s0 2D packed (3,3) c128 @160x192", timeit(f, xp3, wp3),
           B * 16 * 160 * 192 * 9 * 128 * 128 * 2, eq0)

    # (d) packed conv as 4 explicit shifted matmuls (VALID 2x2 == 4 dots)
    @jax.jit
    def packed_mm(x, w):  # x: (N, H+1, W+1, 128), w: (2,2,128,128)
        n, hp, wp_, c = x.shape
        h, w_ = hp - 1, wp_ - 1
        acc = jnp.zeros((n, h, w_, w.shape[-1]), jnp.float32)
        for i in (0, 1):
            for j in (0, 1):
                acc = acc + jnp.einsum(
                    "nhwc,cd->nhwd", x[:, i:i + h, j:j + w_, :], w[i, j],
                    preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)

    report("s0 packed 4-shift einsum c128", timeit(packed_mm, xp, wp),
           B * 16 * 160 * 192 * 4 * 128 * 128 * 2, eq0)

    # (e) s2 packed: (3,3,3) c128 -> packed (3,2,2) c512 VALID
    eq2 = B * 8 * 80 * 96 * 27 * 128 * 128 * 2
    x5 = jnp.asarray(rng.normal(size=(B, 8, 41, 49, 512)), jnp.bfloat16)
    w5 = jnp.asarray(rng.normal(size=(3, 2, 2, 512, 512)) * 0.02, jnp.bfloat16)

    @jax.jit
    def conv5(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)

    report("s2 packed (3,2,2) c512 @40x48", timeit(conv5, x5, w5),
           B * 8 * 40 * 48 * 12 * 512 * 512 * 2, eq2)

    # (f) fold D into H for the (1,3,3) 5D conv: (B, D*H, W, C) 2D conv with
    # a 3x3 kernel is WRONG at D boundaries but measures the emitter delta
    # (boundary fix would mask 2 rows per D slice)
    with open("/tmp/conv_micro2.json", "w") as f_:
        json.dump(results, f_, indent=1)


if __name__ == "__main__":
    main()
