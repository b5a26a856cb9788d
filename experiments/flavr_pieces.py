"""Where does the FLAVR SR engine's time go? (sr_mfu ~0.52 in bench.py —
worth one attribution pass before deciding whether any piece deserves the
packed-layout treatment.)

Times, at bench SR geometry ((455, 633, 20) LR volume -> windows of 4
full-plane slices, batch 2, bf16):

  - encoder only (stem + layer1..4, the KD-teacher path)
  - full UASR forward (encoder + decoder + uncertainty head)
  - per-chunk breakdown scaled to the whole volume
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

from rehrseg_tpu.models import UNet3D

B = int(os.environ.get("FLAVR_B", "2"))
H, W = 464, 640          # padded bench plane (455, 633 -> /16 multiples)

model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
               use_uncertainty=True)
x0 = jnp.zeros((1, 4, 96, 96, 2), jnp.float32)
params = jax.jit(model.init)(jax.random.key(1), x0)
params16 = jax.tree.map(
    lambda t: t.astype(jnp.bfloat16)
    if jnp.issubdtype(t.dtype, jnp.inexact) else t, params)

batch = jax.random.normal(jax.random.key(0), (B, 4, H, W, 2), jnp.bfloat16)
jax.block_until_ready(batch)


def timed(name, fn, *args, reps=3):
    # scalar FETCH, not block_until_ready: on the tunneled platform only a
    # device->host read truly synchronizes (block_until_ready returns
    # early — measured 0.2 ms for a 4.7 TFLOP graph)
    float(jnp.asarray(fn(*args)).astype(jnp.float32))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.asarray(fn(*args)).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts) * 1e3:7.1f} ms", flush=True)
    return min(ts)


@jax.jit
def enc_only(p, b):
    feats = model.apply(p, b, return_intermediate_feature=True)
    return sum(f.astype(jnp.float32).sum() for f in feats)


@jax.jit
def full_fwd(p, b):
    out, unc = model.apply(p, b)
    return out.astype(jnp.float32).sum() + unc.astype(jnp.float32).sum()


if __name__ == "__main__":
    t_enc = timed("encoder only (KD path)", enc_only, params16, batch)
    t_full = timed("full UASR forward     ", full_fwd, params16, batch)
    print(f"decoder+heads: {1e3 * (t_full - t_enc):.1f} ms "
          f"({100 * (1 - t_enc / t_full):.0f}% of fwd)", flush=True)
    # flops attribution
    fl_enc = float(jax.jit(enc_only).lower(params16, batch)
                   .compile().cost_analysis().get("flops", 0.0))
    fl_full = float(jax.jit(full_fwd).lower(params16, batch)
                    .compile().cost_analysis().get("flops", 0.0))
    print(f"raw GFLOP: encoder {fl_enc / 1e9:.0f}, full {fl_full / 1e9:.0f}"
          f" -> enc {fl_enc / t_enc / 1e12:.1f} TF/s,"
          f" dec {(fl_full - fl_enc) / (t_full - t_enc) / 1e12:.1f} TF/s",
          flush=True)
