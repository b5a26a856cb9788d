"""Round 3: the zero-layout-op packed formulations.

Finding from pack_overhead_micro.py: every standalone layout pass costs
24-38 ms (bandwidth-bound) — more than a packed conv. So the packed network
must express layout changes INSIDE convs:
  - unpacked -> packed  == (4,4) stride-2 conv (kernel absorbs the pack)
  - aligned  -> offset  == (2,2) pad(1,1) conv   (same weights as valid)
  - offset   -> aligned == (2,2) VALID conv
  - aligned  -> strided == (2,2) pad(1,0) conv
This measures the (4,4)s2 form and the fused packed ConvNormAct chains.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B = 8

    def rep(name, dt, eq):
        print(f"{name:44s} {dt*1e3:8.2f} ms  eq {eq/dt/1e12:6.1f} TFLOP/s",
              flush=True)

    # (a) s0 conv2 as 2D (4,4) stride-2 c32->128 (unpacked in, packed out)
    eq0 = B * 16 * 320 * 384 * 9 * 32 * 32 * 2
    x = jnp.asarray(rng.normal(size=(B * 16, 320, 384, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(4, 4, 32, 128)) * 0.05, jnp.bfloat16)

    @jax.jit
    def f_a(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    rep("s0 u->a (4,4)s2 c32->128 2D", timeit(f_a, x, w), eq0)

    # (b) s1 conv2 as 5D (3,4,4) stride (1,2,2) c64->256 (u -> packed)
    eq1 = B * 16 * 160 * 192 * 27 * 64 * 64 * 2
    x1 = jnp.asarray(rng.normal(size=(B, 16, 160, 192, 64)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 4, 4, 64, 256)) * 0.05, jnp.bfloat16)

    @jax.jit
    def f_b(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 2, 2), padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)

    rep("s1 u->a (3,4,4)s(1,2,2) c64->256", timeit(f_b, x1, w1), eq1)

    # (c) s2 conv2 as 5D (3,4,4) s(1,2,2) c128->512
    eq2 = B * 8 * 80 * 96 * 27 * 128 * 128 * 2
    x2 = jnp.asarray(rng.normal(size=(B, 8, 80, 96, 128)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 4, 4, 128, 512)) * 0.05, jnp.bfloat16)
    rep("s2 u->a (3,4,4)s(1,2,2) c128->512", timeit(f_b, x2, w2), eq2)

    # (d) fused packed chain at s0: u->o conv + mask + inorm + leaky + o->a
    #     conv + inorm + leaky  (one full packed stage, no layout ops)
    from rehrseg_tpu.ops.pack2d import instance_norm_packed

    wA = jnp.asarray(rng.normal(size=(4, 4, 32, 128)) * 0.05, jnp.bfloat16)
    wB = jnp.asarray(rng.normal(size=(2, 2, 128, 128)) * 0.05, jnp.bfloat16)
    sc = jnp.ones((32,), jnp.bfloat16)
    bi = jnp.zeros((32,), jnp.bfloat16)
    hp, wp_ = 161, 193
    mask = np.ones((hp, wp_, 4, 1), np.float32)
    mask[0, :, 0:2] = 0; mask[-1, :, 2:4] = 0
    mask[:, 0, 0::2] = 0; mask[:, -1, 1::2] = 0
    mask = jnp.asarray(mask.reshape(1, hp, wp_, 4), jnp.bfloat16)
    maskc = jnp.repeat(mask, 32, axis=-1)[None]  # (1,1,hp,wp,128)

    @jax.jit
    def f_stage(x, wA, wB):
        n, h, w_, c = x.shape
        y = jax.lax.conv_general_dilated(
            x, wA, window_strides=(2, 2), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)      # u -> offset packed
        y = y.reshape(8, 16, *y.shape[1:])
        y = y * maskc
        y = instance_norm_packed(y, sc, bi)
        y = jnp.where(y >= 0, y, y * 0.01) * maskc
        y2 = jax.lax.conv_general_dilated(
            y.reshape(-1, *y.shape[2:]), wB, window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)      # offset -> aligned
        y2 = y2.reshape(8, 16, *y2.shape[1:])
        y2 = instance_norm_packed(y2, sc, bi)
        return jnp.where(y2 >= 0, y2, y2 * 0.01)

    dt = timeit(f_stage, x, wA, wB)
    rep("s0 FULL stage packed (2 conv+norm+act)", dt, 2 * eq0)

    # (e) standard full s0 stage 2D for comparison
    w3 = jnp.asarray(rng.normal(size=(3, 3, 32, 32)) * 0.05, jnp.bfloat16)

    @jax.jit
    def f_std(x, w3):
        y = x
        for _ in range(2):
            y = jax.lax.conv_general_dilated(
                y, w3, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            y = y.reshape(8, 16, 320, 384, 32)
            m = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
            v = jnp.var(y, axis=(1, 2, 3), keepdims=True)
            y = (y - m) * jax.lax.rsqrt(v + 1e-5)
            y = jnp.where(y >= 0, y, y * 0.01).reshape(-1, 320, 384, 32)
        return y

    dt = timeit(f_std, x, w3)
    rep("s0 FULL stage standard 2D", dt, 2 * eq0)


if __name__ == "__main__":
    main()
