"""Engine-level variant sweep on the real chip: tiles_per_step x pack_max.

Measures the full bench configuration (4 volumes, packed eval) per variant.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

PATCH = (16, 320, 384)
VOLUME = (20, 455, 633)


def main():
    from rehrseg_tpu.models import SegModel, DEFAULT_ARCH
    from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed
    from rehrseg_tpu.infer.sliding_window import (
        predict_sliding_window_labels_many)
    from rehrseg_tpu.utils.pad import target_pad

    print("devices:", jax.devices(), flush=True)
    arch = dict(DEFAULT_ARCH)
    model = SegModel(num_classes=2, upscale=4, arch=arch)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, *PATCH, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    vol = rng.normal(size=VOLUME).astype(np.float32)[..., None]
    tgt = [max(s, p) for s, p in zip(vol.shape[:3], PATCH)] + [1]
    vol_p, _ = target_pad(vol, tgt, mode="constant")
    vols = [vol_p, vol_p.copy(), vol_p.copy(), vol_p.copy()]
    voxels = int(np.prod(vol_p.shape[:3]))

    def variant(pack_max, k):
        def lr_fn(p, batch):
            return segmodel_apply_packed(arch, p,
                                         batch.astype(jnp.bfloat16),
                                         pack_max_channels=pack_max)
        try:
            predict_sliding_window_labels_many(
                lr_fn, params, vols[:1], PATCH, tiles_per_step=k)
            t0 = time.perf_counter()
            predict_sliding_window_labels_many(
                lr_fn, params, vols, PATCH, tiles_per_step=k)
            dt = (time.perf_counter() - t0) / len(vols)
            print(f"pack_max={pack_max:3d} k={k}: {voxels/dt/1e6:6.2f} "
                  f"Mvox/s  ({dt*1e3:.0f} ms/vol)", flush=True)
        except Exception as e:
            print(f"pack_max={pack_max:3d} k={k}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    for pack_max, k in [(64, 2), (128, 2), (64, 3), (64, 1)]:
        variant(pack_max, k)


if __name__ == "__main__":
    main()
