"""Distilled stage-2 step-cost ladder (round-5 proof item).

The distilled stage-2 step at full production geometry (B=2 x
(16,256,320)) crashes the tunnel's remote-compile helper (documented env
limit), so the teacher's overhead was never measured and the stage-2
wall-time projection silently assumed KD is cheap. This ladder measures
the distilled vs plain step at increasing patch geometry BELOW the crash
threshold and fits the teacher overhead per patch-voxel, giving a stated
projection to production geometry (reference hot loop: train_all.py:
520-556 runs KD at full patch every step; teacher windows :85-112).

Each rung runs in a SUBPROCESS: the helper crash kills the process, so
the parent survives and records the threshold.

Run on the real TPU: python experiments/distill_ladder.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# In-plane extents must be multiples of 32 (DEFAULT_ARCH: five in-plane
# stride-2 stages), or the decoder skip concats mismatch — (8,64,80) and
# (16,192,240) from the first draft crash on exactly that.
RUNGS = [
    (8, 64, 96),
    (8, 128, 160),
    (16, 128, 160),
    (16, 192, 224),
    (16, 256, 320),
]
B, SEP, NUM_SLICES, PATCH2D = 2, 4, 4, 96


def run_rung(d, h, w, distill):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    from rehrseg_tpu.models import SegModel, DEFAULT_ARCH, UNet3D, Distiller
    from rehrseg_tpu.train import (TrainState, nesterov_sgd,
                                   make_seg_train_step, SegBatch)
    from rehrseg_tpu.train.optim import poly_epoch_schedule

    arch = dict(DEFAULT_ARCH)
    model = SegModel(num_classes=2, upscale=SEP, arch=arch)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, d, h, w, 1)).astype(np.float32)
    lab_lr = (rng.normal(size=(B, d, h, w, 1)) > 0).astype(np.float32)
    lab_hr = (rng.normal(size=(B, d * SEP, h, w, 1)) > 0).astype(np.float32)
    unc = rng.uniform(0.5, 1.0, size=(B, d, h, w, 1)).astype(np.float32)
    batch = SegBatch(*[jnp.asarray(a) for a in (img, lab_lr, lab_hr, unc)])

    seg_params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(img[:1]))
    tx = nesterov_sgd(poly_epoch_schedule(1e-3, 200, 100))

    flavr_model = flavr_params = dist = None
    if distill:
        flavr_model = UNet3D(img_channels=2, n_inputs=NUM_SLICES,
                             n_outputs=SEP, use_uncertainty=True)
        xf = jnp.zeros((1, NUM_SLICES, PATCH2D, PATCH2D, 2))
        flavr_params = flavr_model.init(jax.random.key(1), xf)
        dist = Distiller(student_dim=arch["features_per_stage"][1],
                         teacher_dim=64, lambda_l1=0.0, lambda_cosine=1.0,
                         lambda_structure=1.0)
        dparams = dist.init(jax.random.key(3),
                            jnp.zeros((1, 2, 8, 8,
                                       arch["features_per_stage"][1])),
                            jnp.zeros((1, 2, 8, 8, 64)))
        params = {"seg": seg_params, "distiller": dparams}
    else:
        params = seg_params

    step = make_seg_train_step(model, tx, enable_uncertainty=True,
                               enable_distillation=distill,
                               flavr_model=flavr_model, distiller=dist,
                               donate=True, packed=True, remat=True,
                               precision="bf16")
    state = TrainState.create(params, tx)
    t_c0 = time.perf_counter()
    state, m = step(state, flavr_params, batch)
    float(m["loss"])
    compile_s = time.perf_counter() - t_c0
    # pipelined timing: chain steps through the donated state, one fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            state, m = step(state, flavr_params, batch)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 4)
    print(json.dumps({"d": d, "h": h, "w": w, "distill": distill,
                      "ms": round(best * 1e3, 1),
                      "compile_s": round(compile_s, 1),
                      "loss": float(m["loss"])}), flush=True)


def main():
    rows = []
    for (d, h, w) in RUNGS:
        for distill in (False, True):
            cmd = [sys.executable, os.path.abspath(__file__),
                   str(d), str(h), str(w), str(int(distill))]
            try:
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=1500,
                    cwd=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))
            except subprocess.TimeoutExpired:
                print(f"({d},{h},{w}) distill={distill}: TIMEOUT",
                      flush=True)
                continue
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if out.returncode != 0 or not line:
                tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
                print(f"({d},{h},{w}) distill={distill}: CRASH rc="
                      f"{out.returncode} :: {' | '.join(tail)[:300]}",
                      flush=True)
                continue
            row = json.loads(line[-1])
            rows.append(row)
            print(f"({d},{h},{w}) distill={distill}: {row['ms']} ms "
                  f"(compile {row['compile_s']} s)", flush=True)

    # teacher overhead per patch-voxel + projection
    by_geom = {}
    for r in rows:
        by_geom.setdefault((r["d"], r["h"], r["w"]), {})[r["distill"]] = r
    print("\n geometry      plain    distilled   overhead   ns/patch-vox")
    fits = []
    for g, pair in sorted(by_geom.items()):
        if True in pair and False in pair:
            vox = B * g[0] * g[1] * g[2]
            ov = pair[True]["ms"] - pair[False]["ms"]
            print(f" {g}: {pair[False]['ms']:8.1f} {pair[True]['ms']:10.1f}"
                  f" {ov:9.1f} ms {ov * 1e6 / vox:10.1f}", flush=True)
            fits.append((vox, ov))
    if fits:
        slope = sum(o for _, o in fits[-2:]) / sum(v for v, _ in fits[-2:])
        proj_vox = B * 16 * 256 * 320
        print(f"\nprojection: teacher overhead at B=2x(16,256,320) ~= "
              f"{slope * proj_vox:.0f} ms/step "
              f"(linear in patch voxels, slope from the top rungs)",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 5:
        run_rung(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                 bool(int(sys.argv[4])))
    else:
        main()
