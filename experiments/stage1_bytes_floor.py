"""HBM-bytes floor for the stage-1 FLAVR+UASR train step (the stage-2
sibling is experiments/stage2_bytes_floor.py; this completes the "every
hot training path carries a roofline verdict" story).

Stage-1 measured ~0.5-0.76 raw MFU across sessions (docs/BENCHMARKS.md
"Stage-1 FLAVR step") — much higher arithmetic intensity than stage 2
(C=256/512 deep layers), so the expectation is compute-bound: a
measured/floor ratio well above 1 with the FLOP-side MFU the binding
signal. This script checks that expectation instead of assuming it.
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
from rehrseg_tpu.train import TrainState, make_sr_train_step, onecycle_adam

from stage2_bytes_floor import measure_hbm_bw, cost_keys


def main():
    bw = measure_hbm_bw()
    print(f"achievable HBM bandwidth (fused stream): {bw:.0f} GB/s",
          flush=True)

    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    rng = np.random.default_rng(0)
    B = 32
    lr = jnp.asarray(rng.normal(size=(B, 4, 96, 96, 2)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(B, 16, 96, 96, 2)), jnp.float32)
    params_host = jax.tree.map(np.asarray, jax.jit(model.init)(
        jax.random.key(0), lr[:1]))
    tx, _ = onecycle_adam(1e-4, 1000)

    for precision in ("bf16", "fp32"):
        params = jax.tree.map(jnp.asarray, params_host)
        step = make_sr_train_step(model, tx, enable_uncertainty=True,
                                  slice_separation=4.0, num_slices=4,
                                  donate=True, precision=precision)
        state = TrainState.create(params, tx)
        flops = byts = 0.0
        try:
            flops, byts = cost_keys(step.lower(state, lr, hr).compile())
        except Exception as e:
            print(f"  lower/compile for cost analysis failed: "
                  f"{type(e).__name__}: {str(e)[:120]}")
        state, m = step(state, lr, hr)
        float(m["loss"])
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            state, m = step(state, lr, hr)
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        # pipelined: dispatch a chain of steps, ONE scalar fetch at the end
        # — how production training runs (no per-step fetch). The profiler
        # (stage1_op_profile.py) measured 74.2 ms/step of device op time vs
        # the 106.7 ms per-step-fetch wall number: each fetch pays a tunnel
        # round-trip that a real training loop never pays.
        n_chain = 8
        best_pipe = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_chain):
                state, m = step(state, lr, hr)
            float(m["loss"])
            best_pipe = min(best_pipe, (time.perf_counter() - t0) / n_chain)
        line = (f"{precision}: {dt*1e3:6.1f} ms/step (per-step fetch) "
                f"| {best_pipe*1e3:6.1f} ms/step pipelined")
        if byts:
            floor = byts / (bw * 1e9)
            line += (f"  bytes={byts/2**30:.2f} GiB  "
                     f"BW-floor={floor*1e3:.1f} ms  "
                     f"pipelined/floor={best_pipe/floor:.2f}")
        if flops:
            line += f"  ({flops/best_pipe/1e12:.1f} TF/s pipelined)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
