"""A/B the packed SR-head forms in the stage-2 TRAIN step at production
geometry (B=2 x (16,256,320), uncertainty, bf16, packed, donate).

Context: the late-round-4 head rework (fused upsample/conv1 + z-paired
stride-2 conv2, experiments/dual_pieces.py) made the dual EVAL engine
2.2x faster — but the same code serves the training forward, and the
training step already sat within ~1% of the 16 GB HBM cliff (round-2
measurement: packed no-remat needed 16.04 GB, 297 MB over). Re-running
experiments/remat_sweep.py after the rework fails to compile in every
remat mode ('auto' head, remat=True: AOT reports 15.99 GB of 15.75 GB).

This sweeps sr_head_form x remat to find the largest form that fits and
its step time, so make_seg_train_step can default to a fitting form while
eval keeps 'auto'.
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
from rehrseg_tpu.train import (TrainState, nesterov_sgd,
                               make_seg_train_step, SegBatch)
from rehrseg_tpu.train.optim import poly_epoch_schedule


def main():
    model = SegModel(num_classes=2, upscale=4, arch=dict(DEFAULT_ARCH))
    b, d, h, w, sep = 2, 16, 256, 320, 4
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * sep, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)
    params_host = jax.tree.map(np.asarray, jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(img[:1])))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 200, 100))

    for form in ("legacy", "cell4", "auto"):
        for remat in (True, "hires"):
            tag = f"form={form!r} remat={remat!r}"
            try:
                batch = SegBatch(*[jnp.asarray(a)
                                   for a in (img, lab_lr, lab_hr, unc)])
                params = jax.tree.map(jnp.asarray, params_host)
                step = make_seg_train_step(
                    model, tx, enable_uncertainty=True,
                    enable_distillation=False, donate=True, packed=True,
                    remat=remat, precision="bf16", sr_head_form=form)
                state = TrainState.create(params, tx)
                t0 = time.perf_counter()
                state, m = step(state, None, batch)
                loss0 = float(m["loss"])
                tc = time.perf_counter() - t0
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    state, m = step(state, None, batch)
                    loss = float(m["loss"])
                    ts.append(time.perf_counter() - t0)
                print(f"{tag}: {min(ts)*1e3:.1f} ms/step (best of 4; "
                      f"compile {tc:.0f}s) loss {loss0:.4f} -> {loss:.4f}")
            except Exception as e:
                msg = str(e).split("\n")[0][:140]
                print(f"{tag}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
