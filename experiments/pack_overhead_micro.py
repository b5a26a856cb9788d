"""Measure the packed path's NON-conv overheads in isolation: layout
repacks, packed instance norm, weight packing — to decide which to
engineer away (the packed model is still slower than standard despite
every conv being faster in isolation)."""

import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from rehrseg_tpu.ops.pack2d import (
        offset_pack_hw, aligned_to_offset_hw, depth_to_space_hw,
        space_to_depth_hw, instance_norm_packed, pack_conv_weights,
        conv_packed, pack_bias)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    x32 = jnp.asarray(rng.normal(size=(8, 16, 320, 384, 32)), jnp.bfloat16)
    xp128 = jnp.asarray(rng.normal(size=(8, 16, 160, 192, 128)), jnp.bfloat16)

    for name, fn, arg in [
        ("offset_pack 32ch full-res", jax.jit(offset_pack_hw), x32),
        ("aligned_to_offset 128ch", jax.jit(aligned_to_offset_hw), xp128),
        ("d2s 128ch", jax.jit(depth_to_space_hw), xp128),
        ("s2d 32ch full-res", jax.jit(space_to_depth_hw), x32),
        ("inorm_packed 128ch", jax.jit(
            lambda a: instance_norm_packed(a, jnp.ones((32,), jnp.bfloat16),
                                           jnp.zeros((32,), jnp.bfloat16))),
         xp128),
        ("inorm standard 32ch", jax.jit(
            lambda a: (a - jnp.mean(a, axis=(1, 2, 3), keepdims=True))
            * jax.lax.rsqrt(jnp.var(a, axis=(1, 2, 3), keepdims=True)
                            + 1e-5)), x32),
        ("leaky 128ch", jax.jit(lambda a: jnp.where(a >= 0, a, a * 0.01)),
         xp128),
    ]:
        dt = timeit(fn, arg)
        print(f"{name:34s} {dt*1e3:7.2f} ms", flush=True)

    # packed conv WITH weight packing traced vs prepacked weights
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 32, 32)) * 0.05, jnp.bfloat16)
    xo = jax.jit(aligned_to_offset_hw)(xp128)

    f_traced = jax.jit(lambda x, w: conv_packed(x, pack_conv_weights(w),
                                                None))
    dt = timeit(f_traced, xo, w)
    print(f"{'conv c128 + in-jit weight pack':34s} {dt*1e3:7.2f} ms",
          flush=True)

    wp = jax.jit(pack_conv_weights)(w)
    f_pre = jax.jit(lambda x, w: conv_packed(x, w, None))
    dt = timeit(f_pre, xo, wp)
    print(f"{'conv c128 prepacked weights':34s} {dt*1e3:7.2f} ms", flush=True)

    # full packed ConvNormAct chain at s0 geometry (conv+bias+norm+leaky)
    b = jnp.zeros((32,), jnp.bfloat16)

    @jax.jit
    def packed_cna(xo, w, b):
        y = conv_packed(xo, pack_conv_weights(w), pack_bias(b))
        y = instance_norm_packed(y, jnp.ones((32,), jnp.bfloat16),
                                 jnp.zeros((32,), jnp.bfloat16))
        return jnp.where(y >= 0, y, y * 0.01)

    dt = timeit(packed_cna, xo, w, b)
    print(f"{'packed ConvNormAct s0':34s} {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def std_cna(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.reshape(-1, 320, 384, 32), w[0], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16).reshape(8, 16, 320, 384, 32)
        y = y + b
        y = (y - jnp.mean(y, axis=(1, 2, 3), keepdims=True)) * jax.lax.rsqrt(
            jnp.var(y, axis=(1, 2, 3), keepdims=True) + 1e-5)
        return jnp.where(y >= 0, y, y * 0.01)

    dt = timeit(std_cna, x32, w, b)
    print(f"{'standard 2D ConvNormAct s0':34s} {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
