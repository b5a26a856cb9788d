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

# Env vars the standard TPU pod runtimes set on every worker (GKE sets
# TPU_WORKER_HOSTNAMES/TPU_WORKER_ID; multislice sets MEGASCALE_*). Their
# presence means "this process is one worker of a multi-host slice" even
# when no REHRSEG_* overrides were given.
_POD_ENV_HINTS = ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")


def _pod_env_present() -> bool:
    return any(os.environ.get(v) for v in _POD_ENV_HINTS)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if distributed mode was initialized. No-ops (returns False)
    for single-process runs or when already initialized, so it is safe to
    call unconditionally.

    On a real TPU pod launched as documented (a bare ``python -m
    rehrseg_tpu.cli`` per host, no REHRSEG_* overrides) the pod runtime's
    own env (TPU_WORKER_HOSTNAMES / MEGASCALE_*) identifies the worker, and
    JAX's cluster auto-detection fills in coordinator/process counts — so
    this attempts an argless ``jax.distributed.initialize()`` whenever those
    hints are present. Without this, every host would see only its local
    chips, believe it is the primary, and concurrently write the same
    shared-storage artifacts (advisor round-3 finding).
    ``assert_pod_consistency`` below is the belt-and-braces check.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("REHRSEG_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("REHRSEG_NUM_PROCESSES", "1"))
    if process_id is None and "REHRSEG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["REHRSEG_PROCESS_ID"])
    if num_processes <= 1 and coordinator_address is None:
        if (_pod_env_present()
                and not (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu")):
            try:
                jax.distributed.initialize()  # cluster auto-detection
                return True
            except (RuntimeError, ValueError) as e:
                print(f"jax.distributed auto-init failed: {e}")
                return False
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


def assert_pod_consistency() -> None:
    """Fail loudly when this process is visibly one worker of a multi-host
    pod (TPU_WORKER_HOSTNAMES lists several hosts) yet jax.distributed never
    spanned them (process_count()==1). Proceeding in that state silently
    bypasses the whole multi-host path: every host trains the full global
    batch and concurrently writes the same shared-storage artifacts."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    n_hosts = len([h for h in hosts.split(",") if h.strip()])
    # deliberate single-process runs on a pod host are legitimate: CPU
    # smoke tests (the same exemption init_distributed applies — it never
    # auto-inits a cpu backend) and an explicit REHRSEG_NUM_PROCESSES=1
    # opt-out (distinguished from the unset default by presence)
    if (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu"):
        return
    if os.environ.get("REHRSEG_NUM_PROCESSES") == "1":
        return
    if n_hosts > 1 and jax.process_count() == 1:
        raise RuntimeError(
            f"TPU_WORKER_HOSTNAMES lists {n_hosts} hosts but "
            "jax.process_count()==1 — jax.distributed was not initialized "
            "across the pod. Set REHRSEG_COORDINATOR/REHRSEG_NUM_PROCESSES/"
            "REHRSEG_PROCESS_ID (docs/DESIGN.md pod runbook) or fix the pod "
            "env so auto-detection works; refusing to run with every host "
            "acting as primary.")


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this process should feed (per-host data
    loading for multi-host DP)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
