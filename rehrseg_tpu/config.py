"""Config system: consumes the same YAML schema as the reference
(configs/brain.yaml, 24 keys) plus the implicit nnUNet artifacts
(plans.json, splits_final.json) — reference train_all.py:577-583,466-470,
259-261.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, fields

import yaml


@dataclass
class Config:
    # paths
    data_path: str = ""
    tmp_path: str = "./tmp"
    checkpoint_path: str = "./checkpoints"
    seg_path: str = ""
    # stage 1
    smore_initialization: bool = True
    pretrain_path: str | None = None
    batch_size_sr: int = 32
    lr_sr: float = 5e-4
    n_patches: int = 8_320_000
    save_iters_sr: int = 10_000
    num_slices: int = 4
    patch_size: int = 96
    slice_thickness: float = 4.0
    target_thickness: float = 1.0
    blur_kernel: str = "rf-pulse-slr"
    random_flip: bool = True
    nnunet_transform: bool = True
    enable_uncertainty: bool = True
    # stage 2
    batch_size_segsr: int = 2
    lr_segsr: float = 1e-3
    epochs: int = 200
    save_iters_segsr: int = 500
    enable_distillation: bool = True
    lambda_l1: float = 0.0
    lambda_cosine: float = 1.0
    lambda_structure: float = 1.0
    # runtime additions (not in the reference schema)
    fold: int | str | None = None  # int, None, or 'all' (fold-parallel)
    uncertainty_steps: int = 20_000  # hard-coded 20000 in train_all.py:448
    # extra: opt-in keys beyond the reference schema (unknown top-level
    # YAML keys merge here). Recognized keys:
    #   precision: 'bf16' (default) | 'fp32'  — training compute policy
    #   device_augment: bool (default True)   — stage-2 aug on device
    #   device_augment_sr: bool (default False) — stage-1 intensity aug on
    #     device (host TrainingTransforms stays the parity oracle)
    #   device_lr_sim: bool — stage-1 LR simulation on device
    #   sr_infer_dtype: 'bf16' — stage-1 volume inference compute dtype
    #   sr_mode: 'img+seg' (default) | 'img' — SMORE channel mode
    #   eval_mirror: bool — TTA mirroring at eval
    #   teacher_window_chunk: int — KD teacher lax.map chunking
    #   profile_dir: str — steady-state stage-2 profiler capture
    #   hr_reference_path: str — HR ground truth for SR PSNR logging
    #   wdsr_n_resblocks / wdsr_num_channels / arch_override /
    #   patch_size_zyx / synthetic_folds — model-size + split overrides
    extra: dict = field(default_factory=dict)

    @property
    def slice_separation(self) -> float:
        return float(self.slice_thickness) / float(self.target_thickness)


def load_config(path: str, **overrides) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    raw.update(overrides)
    known = {f.name: f for f in fields(Config)}
    kwargs = {}
    extra = {}
    for k, v in raw.items():
        if k not in known:
            extra[k] = v
            continue
        # pyyaml (YAML 1.1) parses exponent floats without a dot ("1e-3")
        # as strings — coerce to the declared field type
        ftype = known[k].type
        if isinstance(v, str):
            if ftype in ("float", float):
                v = float(v)
            elif ftype in ("int", int):
                v = int(float(v))
        kwargs[k] = v
    cfg = Config(**kwargs)
    # unknown top-level keys merge INTO an explicit `extra:` mapping rather
    # than clobbering it (both spellings are accepted)
    cfg.extra = {**(cfg.extra or {}), **extra}
    return cfg


def load_plans(seg_path: str) -> dict:
    with open(os.path.join(seg_path, "plans.json")) as f:
        return json.load(f)


def load_splits(seg_path: str) -> list:
    """splits_final.json lives in nnUNet_preprocessed (train_all.py:259)."""
    split_path = os.path.join(
        os.path.dirname(seg_path).replace("nnUNet_results", "nnUNet_preprocessed"),
        "splits_final.json")
    with open(split_path) as f:
        return json.load(f)
