"""Selective-remat sweep for the stage-2 train step (VERDICT r4 item #6):
the packed+remat step measures only 0.16 raw MFU (19.7 TF/s of a 126 TF/s
chip, experiments/stage2_roofline.py) — memory-bound, not compute-bound.
Candidates: remat=True (checkpoint every stage, round-2 default),
remat="hires" (checkpoint only the full/half-res stages that hold the
activation bytes; deep stages keep their activations and skip the
recompute), remat=False (bf16 fits since round 3 but measured slower).
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
    losses = {}
    for remat in (True, "hires", False):
        try:
            params = jax.tree.map(jnp.asarray, params_host)
            step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                       enable_distillation=False,
                                       donate=True, packed=True,
                                       remat=remat, precision="bf16")
            state = TrainState.create(params, tx)
            state, m = step(state, None, batch)
            float(m["loss"])
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                state, m = step(state, None, batch)
                loss = float(m["loss"])
                ts.append(time.perf_counter() - t0)
            losses[str(remat)] = loss
            print(f"stage-2 packed remat={remat!r:8} bf16: "
                  f"{min(ts) * 1e3:6.1f} ms/step  loss={loss:.4f}",
                  flush=True)
        except Exception as e:
            print(f"stage-2 packed remat={remat!r}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    if len(losses) > 1:
        vals = list(losses.values())
        assert all(abs(v - vals[0]) < 5e-3 for v in vals), losses
        print("loss parity across remat modes OK")




def distilled_variant():
    """The pipeline default runs DISTILLATION (frozen FLAVR teacher) —
    more live memory; check which remat modes survive + their times."""
    from rehrseg_tpu.models import UNet3D, Distiller
    arch = dict(DEFAULT_ARCH)
    model = SegModel(num_classes=2, upscale=4, arch=arch)
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    dist = Distiller(student_dim=arch["features_per_stage"][1],
                     teacher_dim=64, lambda_l1=0.0, lambda_cosine=1.0,
                     lambda_structure=1.0)
    b, d, h, w, sep = 2, 16, 256, 320, 4
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(b, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(b, d * sep, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(b, d, h, w, 1)).astype(np.float32)
    batch = SegBatch(*[jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)])
    seg_params = jax.tree.map(np.asarray, jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(img[:1])))
    fparams = jax.jit(flavr.init)(jax.random.key(1),
                                  jnp.zeros((1, 4, h, w, 2)))
    dparams = dist.init(jax.random.key(2),
                        jnp.zeros((1, d, h // 2, w // 2,
                                   arch["features_per_stage"][1])),
                        jnp.zeros((1, d, h // 2, w // 2, 64)))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 200, 100))
    for remat in (True, "hires", False):
        try:
            params = {"seg": jax.tree.map(jnp.asarray, seg_params),
                      "distiller": dparams}
            step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                       enable_distillation=True,
                                       flavr_model=flavr, distiller=dist,
                                       teacher_window_chunk=8,
                                       donate=True, packed=True,
                                       remat=remat, precision="bf16")
            state = TrainState.create(params, tx)
            state, m = step(state, fparams, batch)
            float(m["loss"])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, m = step(state, fparams, batch)
                loss = float(m["loss"])
                ts.append(time.perf_counter() - t0)
            print(f"stage-2 DISTILLED remat={remat!r:8} bf16: "
                  f"{min(ts) * 1e3:6.1f} ms/step  loss={loss:.4f}",
                  flush=True)
        except Exception as e:
            print(f"stage-2 DISTILLED remat={remat!r}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
    distilled_variant()
