"""Stage-2 training-step benchmark: packed vs standard forward/backward at
the realistic stage-2 geometry (batch 2, plans-patch + 64 crop margin)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from rehrseg_tpu.models import SegModel, DEFAULT_ARCH
    from rehrseg_tpu.train import (TrainState, nesterov_sgd,
                                   make_seg_train_step, SegBatch)
    from rehrseg_tpu.train.optim import poly_epoch_schedule

    print("devices:", jax.devices(), flush=True)
    arch = dict(DEFAULT_ARCH)
    model = SegModel(num_classes=2, upscale=4, arch=arch)
    b, d, h, w, sep = 2, 16, 256, 320, 4
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * sep, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)
    batch = SegBatch(*[jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)])

    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(img[:1]))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 200, 100))

    for packed in (False, True):
        try:
            step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                       enable_distillation=False,
                                       donate=True, packed=packed)
            state = TrainState.create(params, tx)
            state, m = step(state, None, batch)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step(state, None, batch)
            loss = float(m["loss"])
            dt = (time.perf_counter() - t0) / 4
            print(f"packed={packed}: {dt*1e3:7.1f} ms/step  loss={loss:.4f}",
                  flush=True)
        except Exception as e:
            print(f"packed={packed}: FAILED {type(e).__name__}: "
                  f"{str(e)[:800]}", flush=True)


if __name__ == "__main__":
    main()
