"""Which formulation of the sr_head z-upsample is fastest on TPU?

The matmul form (moveaxis + einsum + moveaxis) measured 40.6 ms at bench
head geometry (experiments/dual_pieces.py) = ~124 GB/s effective — far
under HBM peak for what is a bandwidth op (each output slice is a lerp of
two input slices). Candidates, all exact vs trilinear_upsample_matrix:

  a. current: moveaxis -> einsum "...n,mn->...m" -> moveaxis
  b. direct einsum "bdhwc,zd->bzhwc" (no explicit moveaxis)
  c. two-gather lerp: out = w0*x[i0] + w1*x[i0+1] (take along axis 1)
  d. one-hot matmul on axis 1 via jnp.tensordot + transpose
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.bspline import (upsample_axis_linear,
                                     trilinear_upsample_matrix)

B, D, HP, WP, C = 8, 16, 160, 192, 128
UP = 4

x = jax.random.normal(jax.random.key(0), (B, D, HP, WP, C), jnp.bfloat16)
jax.block_until_ready(x)

Mnp = trilinear_upsample_matrix(D, UP, True)          # (4D, D)
M = jnp.asarray(Mnp, jnp.bfloat16)

# gather form: row j of M is (1-t) at i0 and t at i0+1 where
# pos = j*(n-1)/(m-1), i0 = min(floor(pos), n-2), t = pos - i0
pos = np.arange(UP * D) * (D - 1) / (UP * D - 1)
i0 = np.minimum(np.floor(pos).astype(np.int64), D - 2)
w1 = pos - i0
w0 = 1.0 - w1
gi0 = jnp.asarray(i0)
gw0 = jnp.asarray(w0, jnp.bfloat16)[None, :, None, None, None]
gw1 = jnp.asarray(w1, jnp.bfloat16)[None, :, None, None, None]


@jax.jit
def form_a(t):
    return upsample_axis_linear(t, UP, axis=1, align_corners=True) \
        .astype(jnp.float32).sum()


@jax.jit
def form_b(t):
    return jnp.einsum("bdhwc,zd->bzhwc", t, M,
                      preferred_element_type=t.dtype) \
        .astype(jnp.float32).sum()


@jax.jit
def form_c(t):
    lo = jnp.take(t, gi0, axis=1)
    hi = jnp.take(t, gi0 + 1, axis=1)
    return (lo * gw0 + hi * gw1).astype(jnp.float32).sum()


@jax.jit
def form_d(t):
    y = jnp.tensordot(t, M, axes=[[1], [1]])   # (B,HP,WP,C,4D)
    return jnp.moveaxis(y, -1, 1).astype(jnp.float32).sum()


def timed(name, fn):
    r = fn(x)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    # exactness first (fp32, small)
    xs = jax.random.normal(jax.random.key(1), (1, D, 4, 4, 2), jnp.float32)
    ra = upsample_axis_linear(xs, UP, axis=1, align_corners=True)
    M32 = jnp.asarray(Mnp, jnp.float32)
    rb = jnp.einsum("bdhwc,zd->bzhwc", xs, M32)
    lo = jnp.take(xs, gi0, axis=1)
    hi = jnp.take(xs, gi0 + 1, axis=1)
    rc = lo * jnp.asarray(w0, jnp.float32)[None, :, None, None, None] \
        + hi * jnp.asarray(w1, jnp.float32)[None, :, None, None, None]
    # TPU matmuls run bf16xbf16+fp32 at default precision -> loose tol
    np.testing.assert_allclose(np.asarray(rb), np.asarray(ra), atol=2e-2)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(ra), atol=2e-2)
    print("exact: b, c == a", flush=True)
    timed("a. moveaxis+einsum (current)", form_a)
    timed("b. direct einsum zd        ", form_b)
    timed("c. two-gather lerp         ", form_c)
    timed("d. tensordot+moveaxis      ", form_d)
