"""TTA-sharded multi-chip inference parity on the 8-device virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from rehrseg_tpu.infer.sliding_window import predict_sliding_window_labels
from rehrseg_tpu.models import SegModel
from rehrseg_tpu.parallel import make_mesh, replicate
from tests.test_models import SMALL_ARCH


def test_tta_mesh_matches_single_device(rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(jax.random.key(0), x0)

    def lr_fn(p, batch):
        return model.apply(p, batch)[0]

    vol = rng.normal(size=(6, 24, 24, 1)).astype(np.float32)
    from rehrseg_tpu.utils.pad import target_pad
    vol_p, _ = target_pad(vol, [6, 24, 24, 1], mode="constant")

    single = predict_sliding_window_labels(
        lr_fn, params, vol_p, (4, 16, 16), mirror=True,
        input_dtype=jnp.float32)
    params_r = replicate(params, mesh)
    with mesh:
        sharded = predict_sliding_window_labels(
            lr_fn, params_r, vol_p, (4, 16, 16), mirror=True,
            input_dtype=jnp.float32, tta_mesh=mesh)
    assert np.array_equal(single, sharded)


def test_spatial_halo_sharded_matches_single_device(rng):
    """Halo-sharded sliding window (VERDICT round-1 item 4): one volume's H
    axis sharded across chips through the model forward (XLA SPMD inserts
    conv halo exchanges) — labels identical to the single-device pass."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(4, spatial=4)      # pure 'spatial' sharding
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(jax.random.key(0), x0)

    def lr_fn(p, batch):
        return model.apply(p, batch)[0]

    vol = rng.normal(size=(6, 32, 24, 1)).astype(np.float32)

    single = predict_sliding_window_labels(
        lr_fn, params, vol, (4, 16, 16), mirror=True,
        input_dtype=jnp.float32)
    params_r = replicate(params, mesh)
    with mesh:
        sharded = predict_sliding_window_labels(
            lr_fn, params_r, vol, (4, 16, 16), mirror=True,
            input_dtype=jnp.float32, tta_mesh=mesh)
    assert np.array_equal(single, sharded)


def test_tta_plus_spatial_2d_mesh_matches_single_device(rng):
    """2-D (data=4, spatial=2) mesh: TTA flips AND tile-H sharded at once."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, spatial=2)
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(jax.random.key(0), x0)

    def lr_fn(p, batch):
        return model.apply(p, batch)[0]

    vol = rng.normal(size=(6, 32, 24, 1)).astype(np.float32)

    single = predict_sliding_window_labels(
        lr_fn, params, vol, (4, 16, 16), mirror=True,
        input_dtype=jnp.float32)
    params_r = replicate(params, mesh)
    with mesh:
        sharded = predict_sliding_window_labels(
            lr_fn, params_r, vol, (4, 16, 16), mirror=True,
            input_dtype=jnp.float32, tta_mesh=mesh)
    assert np.array_equal(single, sharded)
