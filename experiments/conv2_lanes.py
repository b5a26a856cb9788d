"""Is the dual-head conv2's 6 TF/s caused by its 8-lane output?

Times the exact conv2 formulation (offset-packed (4,4)-cell 5^3 conv,
C_in=64 lanes) at 8 output lanes (Cout=2, the production head) vs 64
(Cout=16 control). If the 64-lane control runs 8x the FLOPs in similar
or less time, the MXU pads N to 128 and 15/16 of the array idles at 8
lanes — then folding output structure into lanes (the cell4/cell4z2
repack, ops/pack2d.py) is the fix (VERDICT r4 item #3). Measured:
261.8 ms @ 4.8 TF/s (8 lanes) vs 158.1 ms @ 63.7 TF/s (64 lanes).
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

from rehrseg_tpu.ops.pack2d import pack_conv_weights, pack_bias, conv_packed

B, D = 8, 64
H2, W2 = 161, 193          # offset-packed plane of a (320, 384) tile

# device-side data: host-numpy gen at this size is ~8 GB + a ~100 s
# tunnel upload — generate on chip instead
rng = np.random.default_rng(0)
x = (jax.random.normal(jax.random.key(0), (B, D, H2, W2, 64), jnp.bfloat16)
     * 0.1)
jax.block_until_ready(x)


def timed(name, fn, *args, reps=3, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    note = f"  ({flops / min(ts) / 1e12:5.1f} TF/s raw)" if flops else ""
    print(f"{name}: {ms:7.1f} ms{note}", flush=True)


for cout in (2, 16):
    w = jnp.asarray(rng.normal(size=(5, 5, 5, 16, cout)) * 0.05,
                    jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.bfloat16)

    @jax.jit
    def run(xx, ww=w, bb=b):
        wp = pack_conv_weights(ww)
        return conv_packed(xx, wp, pack_bias(bb)).astype(
            jnp.float32).sum()

    wp_shape = np.asarray(pack_conv_weights(
        np.asarray(w, np.float32))).shape
    raw = (B * D * (H2 - 3) * (W2 - 3) * wp_shape[0] * wp_shape[1]
           * wp_shape[2] * wp_shape[3] * wp_shape[4] * 2)
    timed(f"conv2-like Cout={cout:3d} (packed out {cout * 4:3d} lanes, "
          f"kernel cells {wp_shape[1]}x{wp_shape[2]})", run, x, flops=raw)
