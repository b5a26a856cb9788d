"""Per-op attribution of the stage-1 FLAVR+UASR train step (follow-up to
experiments/stage1_bytes_floor.py, which established the aggregate:
~107 ms at B=32 bf16, 62 TF/s = ~0.49 of chip peak, NOT memory-bound
(1.86x its HBM bytes floor, 209 FLOP/byte) — i.e. the gap lives in
emitter/occupancy, per-op attribution unknown).

Stage 1 is the dominant pipeline cost (2x 260k-step runs, reference
train_all.py:266,333), so even a 15% step win moves hours of wall time.
The question this answers: is the 0.49 MFU uniform across the conv stack
(emitter quality at (4,96,96) geometry — no lever), or concentrated in a
few pathological ops (stem at C_in=2 wasting 126/128 lanes, transpose
convs, SEGating chains — each attackable with an exactness-pinned
rewrite)?

Usage: python experiments/stage1_op_profile.py [--precision=bf16|fp32]
"""

import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.models import UNet3D
from rehrseg_tpu.train import TrainState, make_sr_train_step, onecycle_adam

from stage2_op_profile import top_ops_from_trace  # same XSpace parser

TRACE_DIR = "/tmp/rehrseg_stage1_trace"


def main():
    precision = (sys.argv[1].split("=")[-1] if len(sys.argv) > 1 else "bf16")
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    rng = np.random.default_rng(0)
    B = 32
    lr = jnp.asarray(rng.normal(size=(B, 4, 96, 96, 2)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(B, 16, 96, 96, 2)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), lr[:1])

    tx, _ = onecycle_adam(1e-4, 1000)
    step = make_sr_train_step(model, tx, enable_uncertainty=True,
                              slice_separation=4.0, num_slices=4,
                              precision=precision)
    state = TrainState.create(params, tx)

    t0 = time.perf_counter()
    state, m = step(state, lr, hr)
    print(f"compile+first step {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.4f}")
    for _ in range(2):
        state, m = step(state, lr, hr)
    jax.block_until_ready(m["loss"])

    n_steps = 3
    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(n_steps):
        state, m = step(state, lr, hr)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    rows = top_ops_from_trace(TRACE_DIR)
    if not rows:
        return
    total = sum(ps for ps, _, _ in rows)
    print(f"device op time {total / 1e9:.1f} ms over {n_steps} steps; top 40:")
    for ps, name, md in rows[:40]:
        src = str(md.get("source", "")).split("/")[-1]
        print(f"  {ps / total:6.1%} {ps / (n_steps * 1e9):8.3f} ms/step  "
              f"[{md.get('hlo_category', '?')}] {name[:64]}  "
              f"{str(md.get('tf_op', ''))[:56]}  {src}")

    # category rollup
    cats = {}
    for ps, name, md in rows:
        cats[str(md.get("hlo_category", "?"))] = \
            cats.get(str(md.get("hlo_category", "?")), 0) + ps
    print("by category:")
    for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {ps / total:6.1%} {ps / (n_steps * 1e9):8.3f} ms/step  {cat}")


if __name__ == "__main__":
    main()
