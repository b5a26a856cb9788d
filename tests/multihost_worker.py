"""Worker for the 2-process multi-host DP test (spawned by
tests/test_multihost.py — not collected by pytest itself).

Each process: init jax.distributed over a local gloo cluster, load its
DISJOINT slice of the global batch through the real `BatchLoader(shard=)`,
assemble global arrays with `parallel.multihost`, and run one REAL
`make_sr_train_step` (WDSR) DP step on a mesh spanning both processes.
Prints one JSON line with the local batch digest + post-step param digest;
the parent asserts per-host batches are disjoint and params identical.
"""

import hashlib
import json
import os
import sys

import numpy as np

proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rehrseg_tpu.parallel.distributed import (  # noqa: E402
    init_distributed, local_batch_slice)

assert init_distributed(f"127.0.0.1:{port}", num_processes=n_proc,
                        process_id=proc_id)
assert jax.process_count() == n_proc

import jax.numpy as jnp  # noqa: E402

from rehrseg_tpu.data.datasets import BatchLoader  # noqa: E402
from rehrseg_tpu.models import WDSR  # noqa: E402
from rehrseg_tpu.parallel import make_mesh  # noqa: E402
from rehrseg_tpu.parallel import multihost as mh  # noqa: E402
from rehrseg_tpu.train import (  # noqa: E402
    TrainState, make_sr_train_step, onecycle_adam)

assert mh.is_multihost()
assert mh.data_shard() == (proc_id, n_proc)

GLOBAL_BATCH = 4


class _SynthPairs:
    """Deterministic-from-rng (x, y) SR pairs, WDSR scale-4 geometry."""

    def sample(self, i=None, rng=None):
        x = rng.normal(size=(8, 16, 2)).astype(np.float32)
        y = rng.normal(size=(32, 16, 2)).astype(np.float32)
        y[..., 1] = (y[..., 1] > 0).astype(np.float32)
        return x, y


# --- per-host batch slice (must agree with local_batch_slice) ------------
sl = local_batch_slice(GLOBAL_BATCH)
assert sl == slice(proc_id * (GLOBAL_BATCH // n_proc),
                   (proc_id + 1) * (GLOBAL_BATCH // n_proc))

loader = BatchLoader(_SynthPairs(), GLOBAL_BATCH, seed=7,
                     shard=(proc_id, n_proc))
x_local, y_local = loader.next()
assert x_local.shape == (GLOBAL_BATCH // n_proc, 8, 16, 2)

# --- one real DP train step over the 2-process mesh ----------------------
mesh = make_mesh()
assert mesh.shape["data"] * mesh.shape["spatial"] == n_proc

model = WDSR(out_channel=2, n_resblocks=1, num_channels=8, scale=4.0)
params = model.init(jax.random.key(0), jnp.zeros((1, 8, 16, 2)))
tx, _ = onecycle_adam(1e-3, 10)
state = TrainState.create(params, tx)
state = mh.replicate_global(state, mesh)

x_g, y_g = mh.globalize_batch((x_local, y_local), mesh)
assert x_g.shape[0] == GLOBAL_BATCH  # global view
assert x_g.sharding.is_fully_addressable is False

step = make_sr_train_step(model, tx, enable_uncertainty=False,
                          slice_separation=4, num_slices=1, donate=False)
state, metrics = step(state, x_g, y_g)
loss = float(metrics["loss"])  # replicated scalar: gatherable on all hosts
assert np.isfinite(loss)

# shared-storage checkpoint: every process calls save in lockstep, but only
# process 0 writes (single-writer rule); both can restore the result
ckpt_dir = sys.argv[4]
from rehrseg_tpu.train import checkpoint as ckpt  # noqa: E402

ckpt.save_checkpoint(ckpt_dir, state)
mh.barrier("ckpt-saved")
assert ckpt.has_checkpoint(ckpt_dir)
restored = ckpt.restore_checkpoint(ckpt_dir, state)
assert int(restored.step) == int(state.step)

# params after the step are replicated -> identical bytes on every host
flat = jax.tree_util.tree_leaves(state.params)
h = hashlib.sha256()
for leaf in flat:
    h.update(np.ascontiguousarray(
        np.asarray(jax.device_get(leaf), np.float64)).tobytes())

print(json.dumps({
    "proc": proc_id,
    "batch_digest": hashlib.sha256(
        np.ascontiguousarray(x_local).tobytes()).hexdigest(),
    "batch_head": [round(float(v), 6) for v in x_local.ravel()[:8]],
    "param_digest": h.hexdigest(),
    "loss": loss,
}))
