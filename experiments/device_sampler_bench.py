"""Loader-inclusive stage-1 step time: host loader vs DeviceSRPatchSampler
(round-5 item: the TPU-first fix for the measured input-bound verdict).

Three loops at the production stage-1 geometry (B=32 x (16,96,96) HR
patches, device LR-sim, bf16 step):

  device-only   : pre-built fixed device batch, the 77.5 ms reference
  host loader   : PrefetchLoader(BatchLoader) crop/flip on host (r4 path)
  device sampler: HBM-resident volumes, host draws integers only

Run on the real TPU: python experiments/device_sampler_bench.py
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

from rehrseg_tpu.data.datasets import (SRPatchDataset, BatchLoader,
                                       PrefetchLoader)
from rehrseg_tpu.data.device_sampler import DeviceSRPatchSampler
from rehrseg_tpu.data.device_sr_sim import simulate_lr_batch
from rehrseg_tpu.models import UNet3D
from rehrseg_tpu.train import TrainState, onecycle_adam, make_sr_train_step

from loader_bench import make_data, N_SUBJ, B1, STAGE1_PATCH

STEPS = 30


def run_loop(tag, loader, step, state0, warm=3):
    key = jax.random.key(7)
    state = state0
    for _ in range(warm):
        lr_b, hr_b = loader.next()
        key, sub = jax.random.split(key)
        lr_d = simulate_lr_batch(sub, jnp.asarray(lr_b), 4.0)
        state, m = step(state, lr_d, jnp.asarray(hr_b))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        lr_b, hr_b = loader.next()
        key, sub = jax.random.split(key)
        lr_d = simulate_lr_batch(sub, jnp.asarray(lr_b), 4.0)
        state, m = step(state, lr_d, jnp.asarray(hr_b))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{tag}: {dt * 1e3:7.1f} ms/step loader-inclusive", flush=True)
    if hasattr(loader, "close"):
        loader.close()
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    merged, _ = make_data()
    subs = [f"sub{i}" for i in range(N_SUBJ)]

    def make_ds():
        return SRPatchDataset(merged, subs, 4.0, 1.0, None, "rf-pulse-slr",
                              STAGE1_PATCH, True, blur=True,
                              device_lr_sim=True)

    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 4, 96, 96, 2)))
    tx, _ = onecycle_adam(5e-4, 1000)
    step = make_sr_train_step(model, tx, enable_uncertainty=True,
                              slice_separation=4, num_slices=4,
                              donate=True, precision="bf16")
    state = TrainState.create(params, tx)

    # device-only reference: fixed batch, chained steps
    host = BatchLoader(make_ds(), B1)
    lr0, hr0 = host.next()
    lr_fix = simulate_lr_batch(jax.random.key(1), jnp.asarray(lr0), 4.0)
    hr_fix = jnp.asarray(hr0)
    for _ in range(3):
        state, m = step(state, lr_fix, hr_fix)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, lr_fix, hr_fix)
    float(m["loss"])
    print(f"device-only step    : {(time.perf_counter() - t0) / STEPS * 1e3:7.1f} ms/step",
          flush=True)

    dev = DeviceSRPatchSampler(make_ds(), B1)
    print(f"device sampler HBM  : {dev.hbm_bytes / 1e9:.2f} GB resident",
          flush=True)
    run_loop("device sampler      ", dev, step, state)

    run_loop("host loader         ", PrefetchLoader(BatchLoader(make_ds(),
                                                                B1)),
             step, state)


if __name__ == "__main__":
    main()
