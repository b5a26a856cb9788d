"""A/B: sliding-window label engine with vs without the weight accumulator
(need_weights) at the bench configuration, same process, interleaved reps.
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
    _run_sliding_window, _argmax_uint8)
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
voxels = int(np.prod(vol_p.shape[:3]))


def run(nw: bool):
    logits, w = _run_sliding_window(
        lr_fn, params, vol_p, PATCH, 1, 0.5, True, True, 2,
        need_weights=nw)
    return np.asarray(_argmax_uint8(logits, w))


for nw in (True, False):
    run(nw)  # compile
ab = {True: [], False: []}
for rep in range(3):
    for nw in (True, False):
        t0 = time.perf_counter()
        run(nw)
        ab[nw].append(time.perf_counter() - t0)
for nw in (True, False):
    best = min(ab[nw])
    print(f"need_weights={nw}: times={[round(t, 3) for t in ab[nw]]} "
          f"best {best * 1e3:.0f} ms = {voxels / best / 1e6:.2f} Mvox/s")
