"""Whole-model benchmark: packed vs standard SegModel forward on one chip.

Batch-8 mirror-TTA tile forward of the DEFAULT_ARCH (nnUNet 3d_fullres-like)
model on the bench patch (16, 320, 384), LR head only, bf16 — the unit of
work inside the sliding-window scan (12 such tiles per bench volume)."""

import time
import json

import numpy as np
import jax
import jax.numpy as jnp


PATCH = (16, 320, 384)
B = 8


def timeit(fn, *args, iters=6):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from rehrseg_tpu.models import SegModel, DEFAULT_ARCH
    from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed

    print("devices:", jax.devices(), flush=True)
    arch = dict(DEFAULT_ARCH)
    model = SegModel(num_classes=2, upscale=4, arch=arch)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, *PATCH, 1)),
                    jnp.bfloat16)

    flops = None
    results = {}

    def run(name, fn):
        nonlocal flops
        j = jax.jit(fn)
        if flops is None:
            try:
                flops = float(j.lower(params, x).compile()
                              .cost_analysis().get("flops", 0.0))
            except Exception:
                flops = 0.0
        dt = timeit(j, params, x)
        results[name] = dict(ms=dt * 1e3)
        print(f"{name:36s} {dt*1e3:8.1f} ms", flush=True)
        return dt

    dt0 = run("standard SegModel.apply lr", lambda p, b: model.apply(p, b)[0])
    for pmax in (64, 128):
        dt = run(f"packed pack_max={pmax}",
                 lambda p, b, pm=pmax: segmodel_apply_packed(
                     arch, p, b, pack_max_channels=pm))
        print(f"  speedup vs standard: {dt0/dt:.2f}x  "
              f"(eq {flops/ (dt*8e12)*8:.1f} TFLOP/s)" if flops else "",
              flush=True)

    results["flops_standard"] = flops
    with open("/tmp/packed_model_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
