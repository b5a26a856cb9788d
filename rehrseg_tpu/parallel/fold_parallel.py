"""Fold-parallel training: train all K cross-validation folds simultaneously,
one fold per device.

The reference trains its 5 folds as 5 sequential single-GPU runs
(train_all.py takes --fold). On a TPU slice the folds are independent
programs over identical computation graphs, so they parallelize perfectly:
parameters and batches get a leading fold axis sharded over a 'fold' mesh
axis, and `shard_map` runs the unmodified per-fold train step on each
fold's device with zero cross-fold communication (BASELINE.json config #5,
"5-fold data-parallel on v5e"). Unlike a vmap formulation, shard_map keeps
each fold's convolutions in their original (ungrouped) form.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.state import TrainState


def make_fold_mesh(n_folds: int, devices=None) -> Mesh:
    """1-D ('fold',) mesh over exactly n_folds devices."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_folds, (
        f"need {n_folds} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_folds]), axis_names=("fold",))


def stack_fold_states(states: list[TrainState]) -> TrainState:
    """Stack per-fold TrainStates along a new leading fold axis (the step
    counter becomes a (K,) array so it shards)."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *states)


def unstack_fold_state(state: TrainState, k: int) -> list[TrainState]:
    return [jax.tree.map(lambda x: np.asarray(x)[i], state) for i in range(k)]


def fold_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("fold"))


def make_fold_parallel_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Lift a per-fold `(state, *batch) -> (state, metrics)` step to a
    fold-stacked step via shard_map over the 'fold' axis.

    Feed fold-stacked states/batches placed with `place_fold_*`; each leaf
    must have a leading fold axis of size mesh.shape['fold'].
    """
    spec = P("fold")

    def local_step(state, batch):
        # local shard has fold dim 1: squeeze, run the untouched step, expand
        state1 = jax.tree.map(lambda x: x[0], state)
        batch1 = jax.tree.map(lambda x: x[0], batch)
        new_state, metrics = step_fn(state1, *batch1)
        expand = lambda x: jnp.asarray(x)[None]
        return jax.tree.map(expand, new_state), jax.tree.map(expand, metrics)

    sharded = jax.shard_map(local_step, mesh=mesh,
                            in_specs=(spec, spec), out_specs=(spec, spec))

    @jax.jit
    def wrapper(state, *batch):
        return sharded(state, batch)

    return wrapper


def place_fold_state(state: TrainState, mesh: Mesh) -> TrainState:
    sh = fold_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def place_fold_batch(batch_np, mesh: Mesh):
    """Device-put a (K, B, ...) fold-stacked batch."""
    sh = fold_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), batch_np)
