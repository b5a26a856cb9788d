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


def data_shard() -> tuple[int, int] | None:
    """(process_index, process_count) for BatchLoader(shard=...), or None
    when single-process (keeps the single-host RNG stream byte-identical)."""
    if not is_multihost():
        return None
    return (jax.process_index(), jax.process_count())


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
