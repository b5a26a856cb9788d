"""HBM-bandwidth floor for the stage-2 train step (completes the
roofline: experiments/stage2_roofline.py attributed FLOPs — 0.26 raw MFU,
"memory-bound" — but never said how close the step is to the MEMORY
ceiling, so "memory-bound" was a diagnosis without a floor).

Method:
  1. measure achievable HBM bandwidth with a fused streaming kernel
     (y = a*x + b over a ~1 GiB fp32 buffer: 1 read + 1 write per elem),
     best of N — the realistic ceiling for fused elementwise traffic;
  2. pull "bytes accessed" from the compiled step's cost analysis (post-
     fusion: operand + output bytes per fused computation — XLA's own
     HBM-traffic model);
  3. floor_ms = bytes / BW; report measured / floor.

A measured/floor ratio near 1 means the step runs at speed-of-light for
the traffic the program does — further gains need LESS traffic (layout/
fusion changes), not better scheduling. A large ratio means scheduling/
serialization still leaves room.
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


def measure_hbm_bw(gib: float = 1.0, iters: int = 64, n: int = 4) -> float:
    """Achievable HBM GB/s: ONE dispatch chaining `iters` fused a*x+b
    passes over a fp32 buffer (1 read + 1 write per element per pass).

    Two tunnel pitfalls make the naive single-pass version read ~50x too
    high (a first cut measured "72 TB/s"): block_until_ready does not
    round-trip on the axon attachment, and one 2-GiB pass is ~3 ms of
    kernel under ~30 ms of dispatch noise. Same cure as bench.py's
    chained-matmul peak probe: chain the passes in one dispatch behind
    optimization_barrier (so XLA cannot fuse the chain into a single
    read+write) and force completion with a scalar fetch."""
    elems = int(gib * (1 << 30) / 4)
    x = jnp.ones((elems,), jnp.float32)

    @jax.jit
    def stream(x):
        def body(i, x):
            return jax.lax.optimization_barrier(x * 1.000001 + 1e-7)
        return jax.lax.fori_loop(0, iters, body, x)

    np.asarray(stream(x).ravel()[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(stream(x).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return 2 * elems * 4 * iters / best / 1e9


def cost_keys(compiled):
    ca = compiled.cost_analysis()
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)))


def main():
    bw = measure_hbm_bw()
    print(f"achievable HBM bandwidth (fused stream): {bw:.0f} GB/s",
          flush=True)

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

    for remat in (False, True):
        params = jax.tree.map(jnp.asarray, params_host)
        step = make_seg_train_step(model, tx, enable_uncertainty=True,
                                   enable_distillation=False,
                                   donate=True, packed=True,
                                   remat=remat, precision="bf16")
        state = TrainState.create(params, tx)
        # compiled cost analysis of the jitted step
        flops = byts = 0.0
        try:
            flops, byts = cost_keys(
                step.lower(state, None, batch).compile())
        except Exception as e:
            print(f"  lower/compile for cost analysis failed: "
                  f"{type(e).__name__}: {str(e)[:120]}")
        state, m = step(state, None, batch)
        float(m["loss"])
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            state, m = step(state, None, batch)
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        # pipelined: dispatch a chain of steps (donated state threads them),
        # ONE scalar fetch at the end — how production training runs (the
        # loop never fetches per step). The per-step-fetch number above pays
        # a tunnel round-trip every step on this host.
        n_chain = 8
        best_pipe = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_chain):
                state, m = step(state, None, batch)
            float(m["loss"])
            best_pipe = min(best_pipe, (time.perf_counter() - t0) / n_chain)
        line = (f"remat={remat!r:5}: {dt*1e3:6.1f} ms/step (per-step fetch) "
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
