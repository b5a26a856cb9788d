"""int8 conv formulation study (follow-up to int8_peak_probe.py).

Probe facts: int8 MATMUL runs at 1.64x bf16 on this chip (220 TOPS),
but XLA's CONV emitter shows 0.99x for int8 — the emitter does not use
the int8 MXU path. Bridge candidate: a KxK conv = K^2 shifted matmuls
accumulated in int32 (no im2col inflation; each term is
(B*H*W, Cin) @ (Cin, Cout) over a shifted window).

Times, at seg-engine-representative geometries:
  A. bf16 XLA conv (the production emitter)           — control
  B. int8 XLA conv                                    — emitter check
  C. int8 shifted-matmul conv (9 dots, int32 acc)
  D. bf16 shifted-matmul conv                         — isolates the
     formulation cost from the int8 win

Run on the real TPU: python experiments/int8_conv_forms.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, *args, reps=3):
    # NB: on the axon tunnel block_until_ready does NOT block (reads ~30 us
    # for multi-TFLOP programs) — a scalar fetch is the only real sync.
    np.asarray(fn(*args).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def shifted_matmul_conv(x, w, acc_dtype):
    """3x3 SAME conv as 9 shifted matmuls. x: (B,H,W,C), w: (3,3,Cin,Cout)."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, Cout), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            win = lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, Cin))
            acc = acc + lax.dot_general(
                win, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
    return acc


def bench_geometry(name, B, H, W, Cin, Cout, depth=6):
    rng = np.random.default_rng(0)
    flops = 2.0 * B * H * W * Cin * Cout * 9 * depth

    xb = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)) * 0.02, jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-4, 5, size=(B, H, W, Cin)), jnp.int8)
    wi = jnp.asarray(rng.integers(-4, 5, size=(3, 3, Cin, Cout)), jnp.int8)

    def chain(step):
        def fn(x, w):
            def body(i, x):
                return step(x, w)
            return lax.fori_loop(0, depth, body, x)
        return jax.jit(fn)

    # A: bf16 XLA conv
    def conv_bf16(x, w):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y * 0.01).astype(jnp.bfloat16)

    # B: int8 XLA conv
    def conv_i8(x, w):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.clip(y >> 8, -4, 4).astype(jnp.int8)

    # C: int8 shifted matmuls
    def smm_i8(x, w):
        y = shifted_matmul_conv(x, w, jnp.int32)
        return jnp.clip(y >> 8, -4, 4).astype(jnp.int8)

    # D: bf16 shifted matmuls
    def smm_bf16(x, w):
        y = shifted_matmul_conv(x, w, jnp.float32)
        return (y * 0.01).astype(jnp.bfloat16)

    rows = []
    for label, fn, x, w in (
        ("bf16 XLA conv", conv_bf16, xb, wb),
        ("int8 XLA conv", conv_i8, xi, wi),
        ("int8 9-matmul", smm_i8, xi, wi),
        ("bf16 9-matmul", smm_bf16, xb, wb),
    ):
        try:
            dt = _time(chain(fn), x, w)
            rows.append((label, dt, flops / dt / 1e12))
        except Exception as e:  # noqa: BLE001
            rows.append((label, float("nan"), 0.0))
            print(f"  {label} FAILED: {type(e).__name__}: {str(e)[:200]}")
    base = rows[0][2] or 1.0
    print(f"\n{name}: B={B} H={H} W={W} Cin={Cin} Cout={Cout} (x{depth} chained)")
    for label, dt, tf in rows:
        print(f"  {label:15s} {dt * 1e3 / depth:8.2f} ms/conv  {tf:6.1f} T/s"
              f"  ({tf / base:.2f}x bf16-conv)")


def main():
    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")
    # bottleneck-ish: deep channels, small spatial
    bench_geometry("bottleneck", B=8, H=160, W=192, Cin=320, Cout=320)
    # packed full-res-equivalent: the packed engine's hot conv shape class
    bench_geometry("packed-fullres", B=8, H=80, W=96, Cin=512, Cout=512)
    # mid stage
    bench_geometry("mid", B=8, H=320, W=384, Cin=128, Cout=128, depth=4)


if __name__ == "__main__":
    main()
