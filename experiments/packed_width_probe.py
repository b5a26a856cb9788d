"""Width-alignment probe for the dominant stride-1 packed conv class
(docs/BENCHMARKS.md "Packed-width alignment probe"): offset-parity
tensors have odd widths (w/2+1) and measure ~9-13% slower per useful
pixel than width-padded variants. Recorded as a future lead — see the
BENCHMARKS section for why a padded-width layout was not pursued in
round 4 (emitter luck + mask-pass costs + metadata threading).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.pack2d import conv_packed, pack_conv_weights, pack_bias

B, D = 8, 16


def probe(hp, wp, tag, true_hw=None):
    """true_hw: the unpadded (hp0, wp0) — pad columns carry no data, so
    per-useful-pixel cost must normalize by the TRUE area, not the padded
    shape (normalizing by the padded area overstated the padded variants
    by up to ~4% in the first run of this probe)."""
    x = jax.random.normal(jax.random.key(0), (B, D, hp, wp, 128),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (1, 3, 3, 32, 32),
                          jnp.bfloat16) * 0.05
    wpk = pack_conv_weights(w)
    b = pack_bias(jnp.zeros((32,), jnp.bfloat16))
    f = jax.jit(lambda x: jnp.sum(conv_packed(x, wpk, b)
                                  .astype(jnp.float32)))
    v = f(x)
    jax.block_until_ready(v)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        v = f(x)
        jax.block_until_ready(v)
        best = min(best, time.perf_counter() - t0)
    h0, w0 = true_hw or (hp, wp)
    area = (h0 - 1) * (w0 - 1)
    print(f"{tag}: ({hp},{wp}) {best * 1e3:7.2f} ms  "
          f"({best * 1e12 / area / (B * D):.1f} ps/useful-px)", flush=True)


if __name__ == "__main__":
    probe(161, 193, "offset odd      ")
    probe(161, 200, "w pad to 200    ", true_hw=(161, 193))
    probe(168, 200, "hw pad 168,200  ", true_hw=(161, 193))
    probe(160, 192, "even 160,192    ")
