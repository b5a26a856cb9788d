"""Per-op attribution of the stage-2 train step (follow-up to
experiments/stage2_roofline.py, which established the aggregate: ~545 ms,
11.2 TFLOP executed, 0.16 raw MFU — memory/serialization-bound).

The packed EVAL forward at the same geometry runs at ~0.68 raw MFU, so
the question is WHICH backward/norm/optimizer ops eat the difference.
Captures a jax.profiler trace of a few production-geometry steps and
ranks HLO-op self-times by parsing the xplane.pb directly (the
tensorboard_plugin_profile converters are broken against this env's
protobuf/tensorflow pairing, so we read the XSpace proto ourselves and
aggregate the '/device:TPU:0' plane's 'XLA Ops' line).

FINDING (round 4): the top op was a take_along_axis GATHER in
robust_cross_entropy — 214 ms/step, 42% of the step, ~1.7 GB/s — plus
~11.7 GiB of scatter-backward live buffers. Fixed by the one-hot
multiply-sum form (losses.py); step 543 -> 275 ms (remat=all).

Usage: python experiments/stage2_op_profile.py [--remat=all|hires|none]
"""

import glob
import os
import sys
import time

# must precede any google.protobuf import: the generated xplane_pb2 needs
# the pure-python descriptor path in this environment
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

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


def top_ops_from_trace(trace_dir):
    """Parse the newest xplane.pb under trace_dir and aggregate per-op
    device self-time + metadata from the TPU plane's 'XLA Ops' line.
    Returns [(total_ps, name, meta_dict)] sorted desc."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb captured (profiler may not support this backend)")
        return None
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    pl = next((p for p in xs.planes if p.name.startswith("/device:TPU")), None)
    if pl is None:
        print("no TPU device plane in trace; planes:",
              [p.name for p in xs.planes])
        return None
    ops_line = next((l for l in pl.lines if l.name == "XLA Ops"), None)
    if ops_line is None:
        print("no 'XLA Ops' line; lines:", [l.name for l in pl.lines])
        return None

    def stat_value(st):
        if st.str_value:
            return st.str_value
        if st.ref_value:
            return pl.stat_metadata[st.ref_value].name
        return st.int64_value or st.uint64_value or st.double_value

    agg, meta = {}, {}
    for ev in ops_line.events:
        m = pl.event_metadata[ev.metadata_id]
        name = m.display_name or m.name
        agg[name] = agg.get(name, 0) + ev.duration_ps
        if name not in meta:
            meta[name] = {pl.stat_metadata[st.metadata_id].name: stat_value(st)
                          for st in m.stats}
    return sorted(((ps, name, meta[name]) for name, ps in agg.items()),
                  reverse=True)


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

    n_steps = 3  # single source for the capture loop AND the divisor
    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(n_steps):
        state, m = step(state, None, batch)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    rows = top_ops_from_trace(TRACE_DIR)
    if not rows:
        return
    total = sum(ps for ps, _, _ in rows)
    print(f"device op time {total / 1e9:.1f} ms over {n_steps} steps; top 30:")
    for ps, name, md in rows[:30]:
        src = str(md.get("source", "")).split("/")[-1]
        print(f"  {ps / total:6.1%} {ps / (n_steps * 1e9):8.3f} ms/step  "
              f"[{md.get('hlo_category', '?')}] {name[:60]}  "
              f"{str(md.get('tf_op', ''))[:60]}  {src}")


if __name__ == "__main__":
    main()
