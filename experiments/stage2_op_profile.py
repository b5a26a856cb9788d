"""Per-op attribution of the stage-2 train step (follow-up to
experiments/stage2_roofline.py, which established the aggregate: ~545 ms,
11.2 TFLOP executed, 0.16 raw MFU — memory/serialization-bound).

The packed EVAL forward at the same geometry runs at ~0.68 raw MFU, so
the question is WHICH backward/norm/optimizer ops eat the difference.
Captures a jax.profiler trace of a few production-geometry steps and
parses the xplane into HLO-op self-time ranking via
tensorboard_plugin_profile's hlo_stats converter.

Usage: python experiments/stage2_op_profile.py [--remat=all|hires|none]
"""

import glob
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

TRACE_DIR = "/tmp/rehrseg_stage2_trace"


def build_step(remat):
    model = SegModel(num_classes=2, upscale=4, arch=dict(DEFAULT_ARCH))
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
                               enable_distillation=False, donate=True,
                               packed=True, remat=remat, precision="bf16")
    state = TrainState.create(params, tx)
    return step, state, batch


def top_ops_from_trace(trace_dir, n=30):
    """Parse the newest xplane.pb under trace_dir into (self_time_us, name,
    category) rows using the tensorboard profile plugin's converter."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb captured (profiler may not support this backend)")
        return None
    data = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, tuple):
        data = data[0]
    import json
    rows = None
    try:
        parsed = json.loads(data)
        # gviz DataTable json: {"cols": [...], "rows": [{"c": [{"v": ...}]}]}
        cols = [c.get("label") or c.get("id") for c in parsed["cols"]]
        rows = [[cell.get("v") if cell else None for cell in r["c"]]
                for r in parsed["rows"]]
        return cols, rows
    except Exception as e:
        print(f"hlo_stats parse failed ({type(e).__name__}: {e}); raw head:")
        print(str(data)[:2000])
        return None


def main():
    remat = {"all": True, "hires": "hires", "none": False}[
        (sys.argv[1].split("=")[-1] if len(sys.argv) > 1 else "all")]
    step, state, batch = build_step(remat)

    t0 = time.perf_counter()
    state, m = step(state, None, batch)
    print(f"compile+first step {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.4f}")
    # warm
    for _ in range(2):
        state, m = step(state, None, batch)
    jax.block_until_ready(m["loss"])

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, m = step(state, None, batch)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    out = top_ops_from_trace(TRACE_DIR)
    if out is None:
        return
    cols, rows = out
    print("columns:", cols)
    # find the self-time column
    tcol = next((i for i, c in enumerate(cols)
                 if c and "self" in str(c).lower() and "time" in str(c).lower()),
                None)
    if tcol is None:
        tcol = 2
    rows.sort(key=lambda r: -(r[tcol] or 0))
    total = sum((r[tcol] or 0) for r in rows)
    print(f"total self time: {total:.0f} (col {cols[tcol]}); top 30:")
    for r in rows[:30]:
        frac = (r[tcol] or 0) / max(total, 1e-9)
        print(f"  {frac:6.1%}  {r[tcol]:>12}  {str(r)[:180]}")


if __name__ == "__main__":
    main()
