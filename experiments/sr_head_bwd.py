"""Backward cost of the dual SR head per emission form, at TRAINING
geometry (follow-up to the CE-gather fix: the post-fix stage-2 op profile
shows the head's conv2 backward as the new top op — 34 ms/step, 13.7%,
~19 TF/s on 651 GFLOP; docs/BENCHMARKS.md "CE-gather fix").

Every sr_head_form computes the same function, so their VJPs are equal
mathematically — if one form's BACKWARD emission is much faster, a
custom_vjp could pair the fastest forward with the fastest backward.

Method: time value_and_grad of a scalar readout over the full packed
model fwd+bwd, dual=True per form MINUS the dual=False baseline (exact
isolation of head fwd+bwd, production code path), B=2 x (16,256,320),
bf16 params, remat off.
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

B, D, H, W = 2, 16, 256, 320
UP = 4

arch = dict(DEFAULT_ARCH)
model = SegModel(num_classes=2, upscale=UP, arch=arch)
x0 = jnp.zeros((1, D, H, W, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), x0)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
x = jax.random.normal(jax.random.key(1), (B, D, H, W, 1), jnp.bfloat16)
jax.block_until_ready(x)


def timed(name, loss_fn):
    g = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    v, _ = g(params)
    jax.block_until_ready(v)
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        v, grads = g(params)
        jax.block_until_ready(v)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28} {best * 1e3:7.1f} ms fwd+bwd (compile {tc:.0f}s)",
          flush=True)
    return best


def lr_only(p):
    lg = segmodel_apply_packed(arch, p, x, dual=False, upscale=UP,
                               pack_max_channels=64, remat=False)
    return jnp.sum(lg.astype(jnp.float32) ** 2)


def dual(form):
    def loss(p):
        lg, hr = segmodel_apply_packed(arch, p, x, dual=True, upscale=UP,
                                       pack_max_channels=64, remat=False,
                                       sr_head_form=form)
        return (jnp.sum(lg.astype(jnp.float32) ** 2) +
                jnp.sum(hr.astype(jnp.float32) ** 2))
    return loss


def main():
    base = timed("LR-only (no head)", lr_only)
    for form in ("auto", "cell4", "legacy"):
        t = timed(f"dual sr_head_form={form}", dual(form))
        print(f"  -> head fwd+bwd delta: {(t - base) * 1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
