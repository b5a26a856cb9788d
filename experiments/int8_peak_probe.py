"""Probe: does the attached chip run int8 matmuls/convs faster than bf16?

v5e-class MXUs advertise 2x int8 throughput vs bf16. If that holds here,
an opt-in int8-quantized serving engine is the largest remaining
inference lever (the seg engine is compute-bound at ~0.71 raw MFU).

Uses bench.py's probe discipline exactly: RANDOM operands (a first cut
with jnp.ones read 106 PF/s — XLA constant-folded the whole chain),
one dispatch holding a dependency chain of matmuls, scalar fetch.

Run on the real TPU: python experiments/int8_peak_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 48


def _run_chain(mm, a, b, flops):
    np.asarray(mm(a, b).ravel()[0])  # warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = mm(a, b)
        np.asarray(out.ravel()[0])
        dt = time.perf_counter() - t0
        best = max(best, flops / dt / 1e12)
    return best


def matmul_peak(kind):
    rng = np.random.default_rng(1)
    m, k, n = 8192, 4096, 4096
    if kind == "bf16":
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            def body(i, x):
                return lax.dot(x, b, preferred_element_type=jnp.bfloat16)
            return lax.fori_loop(0, ITERS, body, a)

    elif kind == "int8":
        a = jnp.asarray(rng.integers(-4, 5, size=(m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-4, 5, size=(k, n)), jnp.int8)

        @jax.jit
        def mm(a, b):
            def body(i, x):
                y = lax.dot(x, b, preferred_element_type=jnp.int32)
                # requantize so the chain stays int8 and data-dependent
                return jnp.clip(y >> 10, -4, 4).astype(jnp.int8)
            return lax.fori_loop(0, ITERS, body, a)

    else:  # fp8
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.float8_e4m3fn)
        b = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.float8_e4m3fn)

        @jax.jit
        def mm(a, b):
            def body(i, x):
                y = lax.dot(x, b, preferred_element_type=jnp.float32)
                return (y * (1.0 / 64.0)).astype(jnp.float8_e4m3fn)
            return lax.fori_loop(0, ITERS, body, a)

    flops = ITERS * 2.0 * m * k * n
    return _run_chain(mm, a, b, flops)


def conv_peak(kind, B=8, H=160, W=192, Cin=320, Cout=320, depth=8):
    """Chained 3x3 convs at a bottleneck-ish seg geometry (NHWC)."""
    rng = np.random.default_rng(2)
    if kind == "int8":
        x = jnp.asarray(rng.integers(-4, 5, size=(B, H, W, Cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-4, 5, size=(3, 3, Cin, Cout)), jnp.int8)

        @jax.jit
        def fn(x, w):
            def body(i, x):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return jnp.clip(y >> 12, -4, 4).astype(jnp.int8)
            return lax.fori_loop(0, depth, body, x)

    else:
        x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)) * 0.02,
                        jnp.bfloat16)

        @jax.jit
        def fn(x, w):
            def body(i, x):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return (y * 0.01).astype(jnp.bfloat16)
            return lax.fori_loop(0, depth, body, x)

    flops = 2.0 * B * H * W * Cin * Cout * 9 * depth
    return _run_chain(fn, x, w, flops)


def main():
    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")
    bf16 = matmul_peak("bf16")
    print(f"bf16 matmul peak:   {bf16:7.1f} TF/s")
    for kind in ("int8", "fp8"):
        try:
            v = matmul_peak(kind)
            print(f"{kind:4s} matmul:        {v:7.1f} T/s  ({v / bf16:.2f}x bf16)")
        except Exception as e:  # noqa: BLE001
            print(f"{kind} matmul FAILED: {type(e).__name__}: {str(e)[:250]}")
    bc = conv_peak("bf16")
    print(f"bf16 conv 3x3 C320: {bc:7.1f} TF/s")
    try:
        ic = conv_peak("int8")
        print(f"int8 conv 3x3 C320: {ic:7.1f} T/s  ({ic / bc:.2f}x bf16)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 conv FAILED: {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    main()
