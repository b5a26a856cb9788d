"""CLI entry point: ``python -m rehrseg_tpu.cli --config configs/brain.yaml
--fold 0`` (reference train_all.py:577-583)."""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description="REHRSeg-TPU 3-stage pipeline")
    parser.add_argument("--config", type=str, default="./configs/brain.yaml")
    parser.add_argument(
        "--fold", type=str, default=None,
        help="fold index, or 'all' to train every fold simultaneously "
             "(one fold per device, requires n_devices >= n_folds)")
    args = parser.parse_args()
    fold = args.fold
    if fold is not None and fold != "all":
        fold = int(fold)

    # REHRSEG_PLATFORM=cpu forces the backend (e.g. multi-process CPU
    # validation runs) — must happen before any backend initializes, and
    # works even when the environment pre-imported jax on another platform
    import os
    plat = os.environ.get("REHRSEG_PLATFORM")
    if plat:
        import jax
        os.environ["JAX_PLATFORMS"] = plat
        jax.config.update("jax_platforms", plat)

    # multi-host: no-op single-process; on a pod (or with
    # REHRSEG_COORDINATOR/REHRSEG_NUM_PROCESSES/REHRSEG_PROCESS_ID set)
    # initializes jax.distributed BEFORE any backend use so jax.devices()
    # is the global list and training shards batches per host
    from .parallel.distributed import init_distributed, assert_pod_consistency
    init_distributed()
    assert_pod_consistency()

    from .utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    from .pipeline import main as run_main
    run_main(args.config, fold=fold)


if __name__ == "__main__":
    main()
