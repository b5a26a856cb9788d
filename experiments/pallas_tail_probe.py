"""Real-TPU probe of the fused Pallas TTA-accumulate kernel: does Mosaic
compile it at bench geometry (aligned offsets), is it numerically equal to
the XLA tail, and how fast vs the XLA pieces? (VERDICT r4 item #1)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.ops.pallas_tail import accumulate_tta_tile, zgrouped_combos

PATCH = (16, 320, 384)
N_TILES = 12
C = 2
D, H, W = 20, 456, 640    # aligned-grid padded volume

rng = np.random.default_rng(0)
preds = jnp.asarray(rng.normal(size=(8, C, *PATCH)), jnp.bfloat16)
g = jnp.asarray(rng.uniform(0.1, 1.0, size=PATCH), jnp.float32)
logits = jnp.zeros((C, D, H, W), jnp.float32)
offsets = jnp.asarray([2, 136, 128, 1], jnp.int32)

# ---- correctness on device (one tile vs interpret mode)
got = accumulate_tta_tile(logits, preds, g, offsets)
want = accumulate_tta_tile(logits, preds, g, offsets, interpret=True)
err = float(jnp.max(jnp.abs(got - want)))
print(f"max |tpu - interpret| = {err:.3e}")
assert err < 2e-4, "kernel mismatch on real TPU"

# ---- speed: N_TILES accumulations in a scan (like the engine)
@jax.jit
def run_kernel(lg, p):
    def body(acc, off):
        return accumulate_tta_tile(acc, p, g, off), None
    offs = jnp.tile(offsets, (N_TILES, 1))
    acc, _ = jax.lax.scan(body, lg, offs)
    return acc


@jax.jit
def run_xla(lg, p):
    # the current engine tail: unmirror-mean + gauss-mul + slice/add/update
    combos = zgrouped_combos()

    def body(acc, off):
        parts = [jnp.flip(p[i], axis=tuple(a + 1 for a in c)) if c else p[i]
                 for i, c in enumerate(combos)]
        mean = sum(p_.astype(jnp.float32) for p_ in parts) / 8
        wq = mean * g.astype(jnp.bfloat16).astype(jnp.float32)[None]
        sx, sy, sz = off[0], off[1], off[2]
        cur = jax.lax.dynamic_slice(acc, (0, sx, sy, sz), (C, *PATCH))
        return jax.lax.dynamic_update_slice(acc, cur + wq,
                                            (0, sx, sy, sz)), None
    offs = jnp.tile(offsets, (N_TILES, 1))
    acc, _ = jax.lax.scan(body, lg, offs)
    return acc


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r[0, 0, 0, :8]))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    print(f"{name}: {ms:7.1f} ms for {N_TILES} tiles "
          f"({ms / N_TILES:5.2f} ms/tile)")


k = run_kernel(logits, preds)
x = run_xla(logits, preds)
dd = float(jnp.max(jnp.abs(k - x)))
print(f"max |kernel-scan - xla-scan| = {dd:.3e}")
timed("pallas fused tail", run_kernel, logits, preds)
timed("xla tail (unmirror+gauss+accum)", run_xla, logits, preds)
