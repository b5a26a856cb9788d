"""Orbax checkpointing with true resume (step, params, optimizer state).

The reference persists bare ``state_dict`` blobs every ``save_iters`` steps
(train_all.py:143-151) and its stage-2 save is broken (quirk Q1,
train_all.py:572: Path '/' on a str raises TypeError). Here checkpoints carry
the full train state and restore is exact.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, state: TrainState,
                    step: int | str | None = None,
                    name: str = "state") -> str:
    """Write a checkpoint under directory/<step>/<name>.

    ``step`` may be a string tag (e.g. "best") — tag dirs are ignored by
    latest_step(), so tagged saves never interfere with step-based resume."""
    if step is None:
        step = int(state.step)
    path = os.path.join(os.path.abspath(directory), str(step))
    # multi-host: orbax's save is a COLLECTIVE — every process must call it
    # in lockstep (it syncs internally and only the primary writes host
    # arrays), so callers must never gate a save on process_index; see the
    # broadcast of the best-val-dice decision in pipeline.stage2_segsr
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, name),
                   {"params": _to_host(state.params),
                    "opt_state": _to_host(state.opt_state),
                    "step": step if isinstance(step, int) else int(state.step)},
                   force=True)
    return path


def restore_checkpoint(directory: str, state: TrainState,
                       step: int | str | None = None,
                       name: str = "state") -> TrainState:
    """Restore into the structure of ``state`` (so shardings/dtypes match)."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory, name)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(directory, str(step), name)
    template = {"params": _to_host(state.params),
                "opt_state": _to_host(state.opt_state),
                "step": int(state.step)}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=int(restored["step"]))


def restore_checkpoint_raw(directory: str, step: int | str | None = None,
                           name: str = "state") -> dict:
    """Template-free restore: returns the saved {'params', 'opt_state',
    'step'} tree as host numpy arrays, whatever its structure (e.g. stage-2
    checkpoints carry {'seg': ..., 'distiller': ...} params when
    distillation was on)."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory, name)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(directory, str(step), name)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def latest_step(directory: str, name: str = "state") -> int | None:
    """Latest COMPLETE step. Orbax writes into ``<name>.orbax-checkpoint-tmp``
    and atomically renames to ``<name>`` on success, so a process killed
    mid-save (preemption, timeout) leaves a step dir without ``<name>`` —
    such partial saves must be invisible to resume or the next run crashes
    restoring them (regression: tests/test_aux.py partial-save test)."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory)
             if d.isdigit() and os.path.isdir(os.path.join(directory, d, name))]
    return max(steps) if steps else None


def has_checkpoint(directory: str) -> bool:
    return latest_step(directory) is not None
