"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §5: 'ddp': False hard-coded,
one cuda device at train_all.py:245). The TPU-native replacement scales via
``jax.sharding``: a (data, spatial) mesh; batches shard over 'data', model
params replicate, and — for volumes larger than one chip's HBM — activations
can shard spatially over 'spatial' (XLA inserts halo exchanges for the convs
automatically when inputs/outputs are annotated).

Fold-parallelism (BASELINE config #5, "5-fold data-parallel") maps onto
independent processes/slices, so no special support is needed here beyond DP.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, spatial: int = 1,
              devices=None) -> Mesh:
    """1-D or 2-D mesh over available devices: axes ('data', 'spatial')."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if spatial < 1 or n_devices % spatial != 0:
        raise ValueError(
            f"mesh_spatial={spatial} must divide the visible device count "
            f"({n_devices}); on a single chip only mesh_spatial=1 works — "
            f"for CPU validation force more devices with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N")
    grid = devices.reshape(n_devices // spatial, spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: int | None = None) -> NamedSharding:
    """Shard leading batch dim over 'data'; optionally one spatial dim over
    'spatial'. spatial_axis indexes into the array's dims (e.g. 2 for H in
    (B, D, H, W, C))."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (spatial_axis + 1)
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial_axis: int | None = None):
    """Device-put a (pytree of) host array(s) with batch sharded over 'data'."""
    sh = batch_sharding(mesh, spatial_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
