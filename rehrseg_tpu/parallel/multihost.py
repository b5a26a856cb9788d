"""Multi-host SPMD helpers: global batches and replicated state.

The reference is single-GPU with no distributed layer (SURVEY.md §5:
seg_utils.py:357 hard-codes 'ddp': False). On a TPU pod each process
(host) sees only its local chips; after `distributed.init_distributed()`
`jax.devices()` is the GLOBAL device list and `make_mesh` spans hosts.
Training then needs exactly two conversions at the host↔device boundary,
both provided here:

- batches: each host loads ONLY its slice of the global batch
  (`data.datasets.BatchLoader(shard=...)` / `distributed.local_batch_slice`)
  and `globalize_batch` assembles the per-host numpy slices into one global
  `jax.Array` sharded over the mesh's 'data' axis — zero cross-host data
  movement, the local shard stays on the local chips.
- params/opt state: `replicate_global` turns host-identical pytrees into
  globally-replicated arrays so a plain `jax.jit` train step compiles SPMD
  across all hosts; XLA inserts the gradient all-reduce over ICI/DCN
  automatically (replicated params + sharded batch ⇒ psum'd grads).

Everything no-ops cleanly in single-process mode so call sites don't
branch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_multihost() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on process 0 (and always single-host). Host-side side effects —
    artifact/NIfTI/h5/metrics writes, evaluation — run on the primary only:
    on shared pod storage concurrent writers corrupt files, and
    skip-if-exists checks racing a writer desynchronize the hosts' lockstep
    SPMD programs. (Orbax checkpoint saves are the exception: they are
    COLLECTIVE — all processes call, orbax's primary writes.)"""
    return jax.process_index() == 0


def barrier(tag: str) -> None:
    """Cross-host sync point (no-op single-host): every host must pass the
    same tags in the same order. Placed after primary-only artifact writes
    so other hosts never read half-written stage outputs."""
    if not is_multihost():
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def broadcast_scalar(value: float) -> float:
    """Primary's scalar -> every process (e.g. a val metric computed only
    on process 0 that gates a COLLECTIVE action like an orbax save). No-op
    single-host."""
    if not is_multihost():
        return float(value)
    from jax.experimental import multihost_utils
    return float(multihost_utils.broadcast_one_to_all(
        np.float32(value if is_primary() else 0.0)))


def any_flag(flag: bool) -> bool:
    """Cross-host OR of a local flag (collective; all hosts must call).
    Used so a SIGTERM caught by ONE host still checkpoints the whole pod —
    gating a collective orbax save on a host-local flag deadlocks
    (checkpoint.py note). No-op single-host."""
    if not is_multihost():
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(multihost_utils.process_allgather(
        np.asarray(bool(flag))).any())


def localize(tree):
    """Globally-replicated jax.Arrays -> host numpy (every host holds the
    full value). Lets inference/eval run as plain per-host programs with no
    collectives, so the primary can run them alone without deadlocking the
    pod. Identity for already-local trees."""
    return jax.tree.map(np.asarray, tree)


def data_shard() -> tuple[int, int] | None:
    """(process_index, process_count) for BatchLoader(shard=...), or None
    when single-process (keeps the single-host RNG stream byte-identical)."""
    if not is_multihost():
        return None
    return (jax.process_index(), jax.process_count())


def validate_global_batch(global_batch: int, mesh: Mesh,
                          axis: str = "data", what: str = "batch") -> None:
    """DP sharding needs the GLOBAL batch divisible by the mesh's data-axis
    extent (= all devices on that axis, not just the process count — a
    2-host x 4-chip pod has data=8). Fail early with guidance instead of a
    cryptic make_array error at step 1."""
    n = int(mesh.shape[axis])
    if global_batch % n != 0:
        raise ValueError(
            f"{what}={global_batch} must be a multiple of the mesh '{axis}' "
            f"axis ({n} devices across {jax.process_count()} processes); "
            f"raise {what} to {((global_batch // n) + 1) * n} or run a "
            f"smaller slice")


def globalize_batch(tree, mesh: Mesh, axis: str = "data"):
    """Assemble per-host local batch slices into global arrays sharded over
    `axis`. Leaves must be the LOCAL portion (global_batch/process_count
    leading dim). Identity (jnp.asarray) in single-process mode."""
    if not is_multihost():
        return jax.tree.map(jax.numpy.asarray, tree)
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def place_global(tree, mesh: Mesh, spec: P):
    """Per-host local arrays -> one global jax.Array sharded as ``spec``.

    Generalizes :func:`globalize_batch` to arbitrary PartitionSpecs (e.g.
    P('data', None, 'spatial') for spatially-sharded stage-2 training, where
    the batch dim shards over 'data' and H over 'spatial'). Works in both
    worlds: single-process -> device_put (the process holds the full
    array); multi-process -> make_array_from_process_local_data (each
    process holds its batch slice with full spatial extent — the 'spatial'
    axis spans each host's local devices)."""
    sh = NamedSharding(mesh, spec)
    if not is_multihost():
        return jax.tree.map(
            lambda x: jax.device_put(jax.numpy.asarray(x), sh), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def replicate_any(tree, mesh: Mesh):
    """Host-identical pytree -> replicated jax.Arrays on ``mesh`` — like
    :func:`replicate_global` but also places in single-process mode (needed
    when a single-host mesh carries a 'spatial' axis: params must be
    device_put replicated so the jitted step compiles SPMD instead of
    single-device)."""
    if not is_multihost():
        sh = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return replicate_global(tree, mesh)


def replicate_global(tree, mesh: Mesh):
    """Host-identical pytree -> globally replicated jax.Arrays on `mesh`.

    Every process must hold the same values (true for params restored from
    the same checkpoint or inited from the same seed). Identity in
    single-process mode."""
    if not is_multihost():
        return tree
    sh = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, tree)


def globalize_key(key, mesh: Mesh):
    """Replicate a PRNG key across the mesh (hosts advance keys in lockstep,
    so the same key value exists everywhere)."""
    if not is_multihost():
        return key
    sh = NamedSharding(mesh, P())
    data = jax.make_array_from_process_local_data(
        sh, np.asarray(jax.random.key_data(key)))
    return jax.random.wrap_key_data(data, impl=jax.random.key_impl(key))
