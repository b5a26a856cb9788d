"""Stage-2 train-step roofline attribution (VERDICT r4 item #6): the
544 ms/step packed+remat number has never carried an eq-TFLOP/MFU figure,
so nobody knows whether to attack it.

Reports, for the production geometry (B=2 x (16,256,320), uncertainty,
bf16 policy, packed+remat):

  - RAW executed FLOPs from the compiled HLO's cost analysis — this
    COUNTS the remat recompute and the packing inflation (it is the
    program that actually runs);
  - parity FLOPs = unpacked forward FLOPs x 3 (fwd + ~2x bwd), the
    useful-math estimate;
  - step time and both MFU attributions vs the chained-probe chip peak.

Also measures the stage-1 FLAVR step the same way for comparison.
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
import bench as _bench


def flops_of_compiled(fn, *args):
    try:
        lowered = jax.jit(fn).lower(*args)
        return float(lowered.compile().cost_analysis().get("flops", 0.0))
    except Exception as e:
        print(f"  cost_analysis failed: {type(e).__name__}")
        return 0.0


def main():
    peak = _bench._measure_chip_peak()
    print(f"chip peak probe: {peak:.1f} TFLOP/s")

    # ------------------------- stage 2
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
    step = make_seg_train_step(model, tx, enable_uncertainty=True,
                               enable_distillation=False, donate=False,
                               packed=True, remat=True, precision="bf16")
    state = TrainState.create(params, tx)

    raw_flops = flops_of_compiled(
        lambda s, bb: step(s, None, bb), state, batch)

    # parity: unpacked dual forward FLOPs x 3 (lowered-only analysis — the
    # unpacked fwd+bwd at this geometry does not fit HBM)
    try:
        lowered = jax.jit(lambda p, x: model.apply(p, x)).lower(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), params),
            jnp.zeros((b, d, h, w, 1), jnp.bfloat16))
        fwd_parity = float(lowered.cost_analysis().get("flops", 0.0))
    except Exception:
        fwd_parity = 0.0

    state, m = step(state, None, batch)
    float(m["loss"])
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, m = step(state, None, batch)
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"stage-2 packed+remat bf16 step: {dt * 1e3:.1f} ms")
    if raw_flops:
        print(f"  raw executed: {raw_flops / 1e12:.2f} TFLOP -> "
              f"{raw_flops / dt / 1e12:.1f} TF/s "
              f"({raw_flops / dt / 1e12 / peak:.2f} raw MFU)")
    if fwd_parity:
        parity = 3 * fwd_parity
        print(f"  parity (3x unpacked fwd): {parity / 1e12:.2f} TFLOP -> "
              f"{parity / dt / 1e12:.1f} TF/s "
              f"({parity / dt / 1e12 / peak:.2f} parity MFU)")
        if raw_flops:
            print(f"  remat+packing overhead factor: "
                  f"{raw_flops / parity:.2f}x")

    # ------------------------- stage 1 (for scale)
    flavr = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    x = jnp.asarray(rng.normal(size=(32, 4, 96, 96, 2)).astype(np.float32))
    y = rng.normal(size=(32, 16, 96, 96, 2)).astype(np.float32)
    y[..., 1] = (y[..., 1] > 0).astype(np.float32)
    y = jnp.asarray(y)
    fparams = jax.jit(flavr.init)(jax.random.key(0), x[:1])
    ftx, _ = onecycle_adam(5e-4, 1000)
    fstep = make_sr_train_step(flavr, ftx, enable_uncertainty=True,
                               slice_separation=4, num_slices=4,
                               donate=False, precision="bf16")
    fstate = TrainState.create(fparams, ftx)
    raw1 = flops_of_compiled(lambda s, a, bb: fstep(s, a, bb), fstate, x, y)
    fstate, m = fstep(fstate, x, y)
    float(m["loss"])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        fstate, m = fstep(fstate, x, y)
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    dt1 = min(ts)
    print(f"stage-1 FLAVR+UASR bf16 step: {dt1 * 1e3:.1f} ms")
    if raw1:
        print(f"  raw executed: {raw1 / 1e12:.2f} TFLOP -> "
              f"{raw1 / dt1 / 1e12:.1f} TF/s "
              f"({raw1 / dt1 / 1e12 / peak:.2f} raw MFU)")


if __name__ == "__main__":
    main()
