"""CLI entry point: ``python -m rehrseg_tpu.cli --config configs/brain.yaml
--fold 0`` (reference train_all.py:577-583)."""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description="REHRSeg-TPU 3-stage pipeline")
    parser.add_argument("--config", type=str, default="./configs/brain.yaml")
    parser.add_argument("--fold", type=int, default=None)
    args = parser.parse_args()

    from .pipeline import main as run_main
    run_main(args.config, fold=args.fold)


if __name__ == "__main__":
    main()
