"""Multi-host initialization for TPU pods.

The reference is single-GPU with no distributed backend (SURVEY.md §5). For
multi-host TPU slices, call `init_distributed()` once at program start: on a
pod each process sees its local chips and `jax.devices()` becomes the global
device list; `make_mesh` then spans hosts, with collectives riding ICI
within a slice and DCN across slices.
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if distributed mode was initialized. No-ops (returns False)
    for single-process runs or when already initialized, so it is safe to
    call unconditionally.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("REHRSEG_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("REHRSEG_NUM_PROCESSES", "1"))
    if process_id is None and "REHRSEG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["REHRSEG_PROCESS_ID"])
    if num_processes <= 1 and coordinator_address is None:
        return False
    try:
        # CPU backends need the gloo transport for cross-process
        # collectives (used by the 2-process CI test; TPU pods ignore it)
        if (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except (RuntimeError, ValueError) as e:
        # already initialized, or single-process TPU runtime
        print(f"jax.distributed init skipped: {e}")
        return False


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this process should feed (per-host data
    loading for multi-host DP)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
