"""Micro-timing of the sliding-window scan tail pieces at bench geometry:
mirror-batch build, unmirror-mean, gaussian-multiply+accumulate, argmax.
Each piece is timed as its own jit with a scalar consume (the tunneled
backend's block_until_ready does not synchronize reliably; fetching a
scalar does).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.infer.sliding_window import (
    _flip_axes_combinations, _mirror_batch, _unmirror_mean)

PATCH = (16, 320, 384)
N = 12  # tiles per volume at bench geometry
combos = _flip_axes_combinations(3)

rng = np.random.default_rng(0)
tile = jnp.asarray(rng.normal(size=(*PATCH, 1)), jnp.bfloat16)
preds = jnp.asarray(rng.normal(size=(8, *PATCH, 2)), jnp.bfloat16)
g = jnp.asarray(rng.uniform(0.1, 1, size=PATCH), jnp.float32)
buf = jnp.zeros((20, 455, 633, 2), jnp.float32)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32)) if hasattr(
        out, "ravel") else float(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        # scalar fetch forces execution through the tunnel
        float(jnp.sum(r[..., 0]).astype(jnp.float32)) if r.ndim else float(r)
        ts.append(time.perf_counter() - t0)
    per_tile = min(ts) * 1e3 / N
    print(f"{name}: {min(ts) * 1e3:7.1f} ms for {N} tiles "
          f"({per_tile:5.2f} ms/tile)")


@jax.jit
def mirror_n(t):
    def body(c, x):
        b = _mirror_batch(t + x, combos)
        return c + b[0, 0, 0, 0, 0].astype(jnp.float32), None
    c, _ = lax.scan(body, jnp.float32(0),
                    jnp.arange(N, dtype=jnp.bfloat16) * 1e-3)
    return jnp.full((1,), c)


@jax.jit
def unmirror_n(p):
    def body(c, x):
        m = _unmirror_mean(p + x, combos)
        return c + m.astype(jnp.float32).sum(), None
    c, _ = lax.scan(body, jnp.float32(0),
                    jnp.arange(N, dtype=jnp.bfloat16) * 1e-3)
    return jnp.full((1,), c)


@jax.jit
def accum_n(p0, gg, b):
    def body(buf_c, x):
        pred = (p0[0] + x).astype(jnp.float32) * gg[..., None]
        cur = lax.dynamic_slice(buf_c, (2, 40, 60, 0), (*PATCH, 2))
        return lax.dynamic_update_slice(buf_c, cur + pred, (2, 40, 60, 0)), None
    out, _ = lax.scan(body, b, jnp.arange(N, dtype=jnp.bfloat16) * 1e-3)
    return out[:1, 0, 0, :1]


@jax.jit
def argmax_once(b):
    return jnp.argmax(b, axis=-1).astype(jnp.uint8)[:1, :1, :1]


timed("mirror-batch build", mirror_n, tile)
timed("unmirror-mean", unmirror_n, preds)
timed("gauss-mul + accumulate", accum_n, preds, g, buf)
out = argmax_once(buf)
t0 = time.perf_counter()
out = argmax_once(buf)
float(out.astype(jnp.float32).sum())
print(f"argmax (once/volume): {(time.perf_counter() - t0) * 1e3:7.1f} ms")
