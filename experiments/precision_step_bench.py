"""Mixed-precision training-step benchmark: fp32 vs the bf16 policy
(train/precision.py, fp32 master weights) on the two hot loops at their
production geometries — stage-1 FLAVR+UASR step (B=32 x (4,96,96,2)) and
stage-2 packed+remat seg step (B=2 x (16,256,320), uncertainty).
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

from rehrseg_tpu.models import SegModel, UNet3D, DEFAULT_ARCH
from rehrseg_tpu.train import (TrainState, nesterov_sgd, onecycle_adam,
                               make_seg_train_step, make_sr_train_step,
                               SegBatch)
from rehrseg_tpu.train.optim import poly_epoch_schedule


def bench_stage1():
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 4, 96, 96, 2)).astype(np.float32))
    y = rng.normal(size=(32, 16, 96, 96, 2)).astype(np.float32)
    y[..., 1] = (y[..., 1] > 0).astype(np.float32)
    y = jnp.asarray(y)
    params_host = jax.tree.map(np.asarray,
                               jax.jit(model.init)(jax.random.key(0), x[:1]))
    tx, _ = onecycle_adam(5e-4, 1000)
    for precision in ("fp32", "bf16"):
        params = jax.tree.map(jnp.asarray, params_host)
        step = make_sr_train_step(model, tx, enable_uncertainty=True,
                                  slice_separation=4, num_slices=4,
                                  donate=True, precision=precision)
        state = TrainState.create(params, tx)
        state, m = step(state, x, y)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(8):
            state, m = step(state, x, y)
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / 8
        print(f"stage-1 FLAVR+UASR B=32 {precision}: {dt * 1e3:6.1f} ms/step"
              f"  loss={loss:.4f}", flush=True)


def bench_stage2():
    arch = dict(DEFAULT_ARCH)
    model = SegModel(num_classes=2, upscale=4, arch=arch)
    b, d, h, w, sep = 2, 16, 256, 320, 4
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * sep, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)
    batch = SegBatch(*[jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)])
    params_host = jax.tree.map(np.asarray, jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(img[:1])))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 200, 100))
    for precision, remat in (("fp32", True), ("bf16", True), ("bf16", False)):
        try:
            params = jax.tree.map(jnp.asarray, params_host)
            step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                       enable_distillation=False, donate=True,
                                       packed=True, remat=remat,
                                       precision=precision)
            state = TrainState.create(params, tx)
            state, m = step(state, None, batch)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step(state, None, batch)
            loss = float(m["loss"])
            dt = (time.perf_counter() - t0) / 4
            print(f"stage-2 packed remat={remat} B=2 {precision}: "
                  f"{dt * 1e3:6.1f} ms/step  loss={loss:.4f}", flush=True)
        except Exception as e:
            print(f"stage-2 packed remat={remat} {precision}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench_stage1()
    bench_stage2()
