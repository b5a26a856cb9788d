"""Attribution: packed batch-8 tile forward alone vs the full sliding-window
engine (12 tiles) — quantifies the scan tail (mirror build, unmirror-mean,
gaussian multiply, accumulate) at the bench configuration.
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

from rehrseg_tpu.models import SegModel, DEFAULT_ARCH
from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed
from rehrseg_tpu.infer.sliding_window import (
    _run_sliding_window, _argmax_uint8, sliding_window_starts)
from rehrseg_tpu.utils.pad import target_pad

PATCH = (16, 320, 384)
VOLUME = (20, 455, 633)

arch = dict(DEFAULT_ARCH)
model = SegModel(num_classes=2, upscale=4, arch=arch)
x0 = jnp.zeros((1, *PATCH, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), x0)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def lr_fn(p, batch):
    return segmodel_apply_packed(arch, p, batch.astype(jnp.bfloat16),
                                 pack_max_channels=64)


rng = np.random.default_rng(0)
vol = rng.normal(size=VOLUME).astype(np.float32)[..., None]
target_shape = [max(s, p) for s, p in zip(vol.shape[:3], PATCH)] + [1]
vol_p, _ = target_pad(vol, target_shape, mode="constant")
n_tiles = len(sliding_window_starts(vol_p.shape[:3], PATCH, 0.5))

# ---- forward only: batch-8 TTA tile, scanned n_tiles times on device ----
tile8 = jnp.asarray(rng.normal(size=(8, *PATCH, 1)), jnp.bfloat16)


@jax.jit
def fwd_scan(p, b):
    def body(c, x):
        # input perturbed per iteration so XLA can't hoist the forward out
        # of the scan; carry consumes one output element so nothing elides
        out = lr_fn(p, b.at[0, 0, 0, 0, 0].add(x))
        # full-output reduction: a single-element read would let XLA's
        # slice-through-conv simplifier shrink the network to one cone
        return c + out.astype(jnp.float32).sum(), None
    xs = jnp.arange(n_tiles, dtype=jnp.bfloat16) * 1e-3
    return jax.lax.scan(body, jnp.float32(0), xs)[0]


float(fwd_scan(params, tile8))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(fwd_scan(params, tile8))
    ts.append(time.perf_counter() - t0)
fwd = min(ts)
print(f"forward-only scan: {fwd * 1e3:.0f} ms total, "
      f"{fwd / n_tiles * 1e3:.1f} ms/tile (x{n_tiles})")

# ---- full engine ----
def engine():
    logits, _ = _run_sliding_window(
        lr_fn, params, vol_p, PATCH, 1, 0.5, True, True, 2,
        need_weights=False)
    return np.asarray(_argmax_uint8(logits))


engine()
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    engine()
    ts.append(time.perf_counter() - t0)
eng = min(ts)
tail = eng - fwd
print(f"engine: {eng * 1e3:.0f} ms -> tail {tail * 1e3:.0f} ms "
      f"({tail / eng * 100:.1f}% of engine time)")


# ---- engine without the label-map fetch (device-resident result) --------
@jax.jit
def _consume(labels):
    return labels.astype(jnp.int32).sum()


def engine_nofetch():
    logits, _ = _run_sliding_window(
        lr_fn, params, vol_p, PATCH, 1, 0.5, True, True, 2,
        need_weights=False)
    return float(_consume(_argmax_uint8(logits)))


engine_nofetch()
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    engine_nofetch()
    ts.append(time.perf_counter() - t0)
eng_nf = min(ts)
print(f"engine w/o label fetch: {eng_nf * 1e3:.0f} ms -> device tail "
      f"{(eng_nf - fwd) * 1e3:.0f} ms ({(eng_nf - fwd) / eng_nf * 100:.1f}%)"
      f"; fetch+upload cost {(eng - eng_nf) * 1e3:.0f} ms")

# ---- pre-uploaded volume: pure device-side scan tail --------------------
from rehrseg_tpu.infer.sliding_window import (
    _sliding_window_scan, _device_gaussian, _device_starts)

g = _device_gaussian(PATCH, True)
starts = _device_starts(tuple(vol_p.shape[:3]), PATCH, 0.5, 1)
dev_vol = jnp.asarray(vol_p.astype(np.float32), jnp.bfloat16)
float(dev_vol[0, 0, 0, 0].astype(jnp.float32))  # ensure upload done


def engine_dev():
    logits, _ = _sliding_window_scan(
        lr_fn, params, dev_vol, starts, g, PATCH,
        tuple(vol_p.shape[:3]), 1, True, 2, need_weights=False)
    return float(_consume(_argmax_uint8(logits)))


engine_dev()
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    engine_dev()
    ts.append(time.perf_counter() - t0)
eng_dev = min(ts)
print(f"engine, volume pre-uploaded: {eng_dev * 1e3:.0f} ms -> pure device "
      f"tail {(eng_dev - fwd) * 1e3:.0f} ms "
      f"({(eng_dev - fwd) / eng_dev * 100:.1f}%); "
      f"volume upload cost {(eng_nf - eng_dev) * 1e3:.0f} ms")
