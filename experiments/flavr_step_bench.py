"""Stage-1 FLAVR training-step composition: forward vs full step, to see
whether the 133 ms step (round 1) has fusion/backward headroom."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    from rehrseg_tpu.models import UNet3D
    from rehrseg_tpu.train import (TrainState, make_sr_train_step,
                                   onecycle_adam)

    print("devices:", jax.devices(), flush=True)
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    rng = np.random.default_rng(0)
    B = 32
    lr = jnp.asarray(rng.normal(size=(B, 4, 96, 96, 2)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(B, 16, 96, 96, 2)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), lr[:1])

    fwd = jax.jit(lambda p, x: model.apply(p, x)[0])
    dt = timeit(fwd, params, lr)
    try:
        fl = float(jax.jit(lambda p, x: model.apply(p, x)[0])
                   .lower(params, lr).compile().cost_analysis()["flops"])
    except Exception:
        fl = 0.0
    print(f"FLAVR fwd B={B}: {dt*1e3:6.1f} ms"
          + (f"  ({fl/dt/1e12:5.1f} TFLOP/s)" if fl else ""), flush=True)

    tx, _ = onecycle_adam(1e-4, 1000)
    step = make_sr_train_step(model, tx, enable_uncertainty=True,
                              slice_separation=4.0, num_slices=4)
    state = TrainState.create(params, tx)

    def run(state):
        s, m = step(state, lr, hr)
        return s.params

    # the step donates its state argument — always thread the NEW state
    st, m = step(state, lr, hr)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(8):
        st, m = step(st, lr, hr)
    jax.block_until_ready(m["loss"])
    dt2 = (time.perf_counter() - t0) / 8
    print(f"FLAVR full step: {dt2*1e3:6.1f} ms"
          + (f"  (~{3*fl/dt2/1e12:5.1f} TFLOP/s fwd+bwd est)" if fl else ""),
          flush=True)


if __name__ == "__main__":
    main()
