"""Multi-host data parallelism: 2-process CPU cluster (gloo) running one
REAL SR train step — proves per-host batch disjointness and identical
replicated params after the gradient all-reduce (SURVEY.md §5 distributed
axis; the reference has no distributed layer at all, seg_utils.py:357
'ddp': False)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from rehrseg_tpu.data.datasets import BatchLoader

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step(tmp_path):
    port = str(_free_port())
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker builds its own 1-device-per-process cluster
    env.pop("XLA_FLAGS", None)
    ckpt_dir = str(tmp_path / "shared_ckpt")
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), "2", port,
                          ckpt_dir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_proc = {o["proc"]: o for o in outs}
    assert set(by_proc) == {0, 1}
    # disjoint per-host batches (different slices of the agreed global batch)
    assert by_proc[0]["batch_digest"] != by_proc[1]["batch_digest"]
    assert by_proc[0]["batch_head"] != by_proc[1]["batch_head"]
    # identical params after one DP step (grad all-reduce worked)
    assert by_proc[0]["param_digest"] == by_proc[1]["param_digest"]
    assert by_proc[0]["loss"] == pytest.approx(by_proc[1]["loss"], rel=1e-6)
    # shared-dir checkpoint written exactly once (primary) and restorable
    # by both (asserted inside the workers)
    assert os.path.isdir(os.path.join(ckpt_dir, "1", "state"))


class _Probe:
    def sample(self, i=None, rng=None):
        return (rng.normal(size=(3,)).astype(np.float32),)


def test_batchloader_shard_semantics():
    """Sharded loaders on N 'hosts' tile the SAME deterministic global batch
    the unsharded=1-shard loader produces, in disjoint contiguous slices."""
    whole = BatchLoader(_Probe(), 8, seed=3, shard=(0, 1))
    (full,) = whole.next()
    parts = []
    for k in range(4):
        (p,) = BatchLoader(_Probe(), 8, seed=3, shard=(k, 4)).next()
        assert p.shape[0] == 2
        parts.append(p)
    np.testing.assert_array_equal(np.concatenate(parts), full)
    # successive steps advance the shared stream identically on every host
    (full2,) = whole.next()
    (p0,) = BatchLoader(_Probe(), 8, seed=3, shard=(0, 4)).next()  # fresh: step1
    assert not np.array_equal(full2[:2], p0)  # step-2 differs from step-1


def test_batchloader_shard_validation():
    with pytest.raises(ValueError):
        BatchLoader(_Probe(), 7, shard=(0, 2))
    with pytest.raises(ValueError):
        BatchLoader(_Probe(), 8, shard=(2, 2))


def test_unsharded_stream_unchanged():
    """shard=None keeps the historical single-host RNG stream byte-identical
    (determinism contract: tests/test_determinism.py pins batch content)."""
    a = BatchLoader(_Probe(), 4, seed=11)
    b = BatchLoader(_Probe(), 4, seed=11, shard=None)
    np.testing.assert_array_equal(a.next()[0], b.next()[0])


def test_validate_global_batch():
    """DP needs the GLOBAL batch divisible by the mesh data-axis extent
    (all devices, not just processes) — fail at startup, not step 1."""
    from rehrseg_tpu.parallel import make_mesh
    from rehrseg_tpu.parallel.multihost import validate_global_batch

    mesh = make_mesh(8)   # data=8 on the virtual CPU mesh
    validate_global_batch(16, mesh)          # ok
    with pytest.raises(ValueError, match="batch_size_segsr=2.*multiple"):
        validate_global_batch(2, mesh, what="batch_size_segsr")
