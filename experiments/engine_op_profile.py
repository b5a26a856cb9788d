"""Per-op attribution of the ALIGNED sliding-window engines (the bench
headline path) — LR and dual — at bench geometry on the real TPU.

Round-5 motivation: the pconv probe measured XLA's conv emitter at
151-197 TF/s on the engine's dominant conv classes, which retires the
"engine is emitter-bound at 0.7 raw MFU" framing: if the convs run near
spec peak individually, the engine's remaining gap to light must live in
NON-conv device time (copies/data formatting, elementwise tails, the
gaussian accumulate, scan glue) or in low-utilization small convs — and
nobody has ever op-profiled the inference engine itself (only the train
steps, experiments/stage{1,2}_op_profile.py). This answers where the
engine's device time actually goes, category by category.

Usage (real TPU): python experiments/engine_op_profile.py [lr|dual]
"""

import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from stage2_op_profile import top_ops_from_trace

TRACE_DIR = "/tmp/rehrseg_engine_trace"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lr"
    # module-level import builds params/volume and jits nothing yet
    import aligned_engine_bench as eng
    run = {"lr": eng.run_aligned, "dual": eng.run_dual_aligned}[which]

    t0 = time.perf_counter()
    run()
    print(f"compile+first volume {time.perf_counter() - t0:.1f}s", flush=True)
    run()

    n = 2
    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(n):
        run()
    jax.profiler.stop_trace()

    rows = top_ops_from_trace(TRACE_DIR)
    if not rows:
        return
    total = sum(ps for ps, _, _ in rows)
    print(f"device op time {total / (n * 1e9):.1f} ms/volume; top 40:")
    for ps, name, md in rows[:40]:
        src = str(md.get("source", "")).split("/")[-1]
        print(f"  {ps / total:6.1%} {ps / (n * 1e9):8.3f} ms/vol  "
              f"[{md.get('hlo_category', '?')}] {name[:64]}  "
              f"{str(md.get('tf_op', ''))[:56]}  {src}")

    cats = {}
    for ps, name, md in rows:
        cat = str(md.get("hlo_category", "?"))
        cats[cat] = cats.get(cat, 0) + ps
    print("by category:")
    for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {ps / total:6.1%} {ps / (n * 1e9):8.3f} ms/vol  {cat}")


if __name__ == "__main__":
    main()
