"""PyTorch checkpoint import: convert reference-format state dicts into flax
param trees.

The reference warm-starts from public torch checkpoints with drop-filtered
non-strict loading (train_all.py:347-356 FLAVR_4x.pth drops encoder.stem.0 /
outconv.1 / feature_fuse; 429-435 same for the uncertainty model; 496-499
nnUNet checkpoint_final.pth strict=False). This module reproduces those
semantics for the flax models:

  - torch conv weights (O, I, *K) -> flax (*K, I, O);
  - torch ConvTranspose (I, O, *K) -> flax transpose_kernel=True (*K, O, I)
    (pure transpose, no spatial flip — verified in tests);
  - weight-normed convs (weight_v/weight_g) -> WNConv v/g;
  - ``module.`` DataParallel prefixes stripped; unmatched or shape-mismatched
    keys skipped (strict=False), with drop-prefix filters applied first.

Key layouts follow the reference module trees (models/FLAVR/FLAVR_arch.py,
models/seg_model.py + dynamic_network_architectures PlainConvUNet,
models/wdsr.py).
"""

from __future__ import annotations


import numpy as np

import flax


def load_torch_state_dict(path: str, key: str | None = None) -> dict:
    """torch.load a checkpoint and return a flat numpy state dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and key in ckpt:
        ckpt = ckpt[key]
    elif isinstance(ckpt, dict):
        for k in ("state_dict", "model", "network_weights"):
            if k in ckpt:
                ckpt = ckpt[k]
                break
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


def strip_module_prefix(sd: dict) -> dict:
    return {k.replace("module.", "") if k.startswith("module.") else k: v
            for k, v in sd.items()}


def drop_keys(sd: dict, substrings) -> dict:
    """Drop-filter parity (train_all.py:350-356)."""
    return {k: v for k, v in sd.items()
            if not any(s in k for s in substrings)}


def _conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I, *K) -> (*K, I, O)."""
    nsp = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """(I, O, *K) -> (*K, O, I) for flax transpose_kernel=True."""
    nsp = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))


def _set(tree: dict, path: tuple, value: np.ndarray) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        return False
    if tuple(node[leaf].shape) != tuple(value.shape):
        return False
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


# torch buffer keys that are never model weights (BatchNorm running stats,
# counters) — excluded from the match-rate denominator
_NON_WEIGHT = ("num_batches_tracked", "running_mean", "running_var")


class ImportReport(list):
    """Diagnostics of one checkpoint import. Subclasses list (contents =
    the skipped mapping keys) for backward compatibility with the
    ``params, loaded, skipped`` unpacking; carries the full report:

      loaded_keys    — torch keys whose tensors landed in the flax tree
      unconsumed     — torch WEIGHT keys present in the checkpoint that no
                       mapping entry consumed (the layout-mismatch signal)
      match_rate     — loaded / (loaded + unconsumed)

    The reference warm-starts with silent strict=False drop-filtering
    (train_all.py:350-356, 496-499); a silent partial match on an nnUNet
    checkpoint would warm-start fewer tensors than intended, so importers
    fail on match_rate < 0.9 unless allow_partial=True."""

    def __init__(self, skipped, loaded_keys, unconsumed):
        super().__init__(skipped)
        self.loaded_keys = list(loaded_keys)
        self.unconsumed = list(unconsumed)
        denom = len(self.loaded_keys) + len(self.unconsumed)
        self.match_rate = (len(self.loaded_keys) / denom) if denom else 1.0

    def summary(self) -> str:
        lines = [f"torch_import: loaded {len(self.loaded_keys)} tensors, "
                 f"match_rate={self.match_rate:.2%}"]
        if self.unconsumed:
            lines.append(f"  UNCONSUMED checkpoint keys ({len(self.unconsumed)}):")
            lines += [f"    {k}" for k in self.unconsumed[:20]]
            if len(self.unconsumed) > 20:
                lines.append(f"    ... and {len(self.unconsumed) - 20} more")
        if list(self):
            lines.append(f"  unfilled mapping entries ({len(self)}): "
                         + ", ".join(list(self)[:10])
                         + (" ..." if len(self) > 10 else ""))
        return "\n".join(lines)


def _apply_mapping(flax_params, sd: dict, mapping: dict[str, tuple],
                   verbose: bool = False, allow_partial: bool = True,
                   what: str = "checkpoint"):
    """mapping: torch_key -> (flax_path_tuple, converter). Returns
    (new_params, loaded_keys, ImportReport)."""
    params = flax.core.unfreeze(flax_params)
    tree = params["params"] if "params" in params else params
    loaded, skipped = [], []
    for tk, (path, conv) in mapping.items():
        if tk not in sd:
            skipped.append(tk)
            continue
        ok = _set(tree, path, conv(sd[tk]))
        (loaded if ok else skipped).append(tk)
    consumed = set(loaded)
    unconsumed = [k for k in sd
                  if k not in consumed
                  and not any(s in k for s in _NON_WEIGHT)
                  and getattr(np.asarray(sd[k]), "ndim", 0) > 0]
    report = ImportReport(skipped, loaded, unconsumed)
    if verbose and (report.unconsumed or skipped):
        print(report.summary())
    if not allow_partial and report.match_rate < 0.9:
        raise ValueError(
            f"{what} import matched only {report.match_rate:.0%} of the "
            f"checkpoint's weight tensors — the key layout is probably not "
            f"what this importer expects. Pass allow_partial=True to "
            f"warm-start anyway (reference strict=False semantics).\n"
            + report.summary())
    return params, loaded, report


# ------------------------------------------------------------------- FLAVR

def flavr_mapping(use_uncertainty: bool) -> dict:
    m: dict[str, tuple] = {}

    def conv3(tk, *path):
        m[f"{tk}.weight"] = (path + ("kernel",), _conv_w)
        m[f"{tk}.bias"] = (path + ("bias",), lambda w: w)

    def convT(tk, *path):
        m[f"{tk}.weight"] = (path + ("kernel",), _convT_w)
        m[f"{tk}.bias"] = (path + ("bias",), lambda w: w)

    conv3("encoder.stem.0", "encoder", "stem")
    for L in range(1, 5):
        for B in range(2):
            base = f"encoder.layer{L}.{B}"
            blk = ("encoder", f"layer{L}_{B}")
            conv3(f"{base}.conv1.0", *blk, "conv1")
            conv3(f"{base}.conv2.0", *blk, "conv2")
            conv3(f"{base}.fg.attn_layer.0", *blk, "fg", "attn")
            if B == 0 and L >= 2:
                m[f"{base}.downsample.0.weight"] = (
                    blk + ("downsample", "kernel"), _conv_w)

    conv3("decoder.0.conv.0", "dec0", "conv")
    conv3("decoder.0.conv.1.attn_layer.0", "dec0", "gate", "attn")
    convT("decoder.1.upconv.0", "dec1", "upconv")
    conv3("decoder.1.upconv.1.attn_layer.0", "dec1", "gate", "attn")
    convT("decoder.2.upconv.0", "dec2", "upconv")
    conv3("decoder.2.upconv.1.attn_layer.0", "dec2", "gate", "attn")
    conv3("decoder.3.conv.0", "dec3", "conv")
    conv3("decoder.3.conv.1.attn_layer.0", "dec3", "gate", "attn")
    convT("decoder.4.upconv.0", "dec4", "upconv")
    conv3("decoder.4.upconv.1.attn_layer.0", "dec4", "gate", "attn")

    conv3("feature_fuse.conv.0", "feature_fuse")
    if use_uncertainty:
        conv3("feature_fuse1.conv.0", "feature_fuse1")
        conv3("uncertainty_early.conv.0", "uncertainty_early")
        conv3("uncertainty_out", "uncertainty_out")
    else:
        conv3("outconv.1", "outconv")
    return m


def import_flavr(flax_params, sd: dict, drop=("encoder.stem.0", "outconv.1",
                                              "feature_fuse"),
                 use_uncertainty: bool = False, verbose: bool = True,
                 allow_partial: bool = True):
    """FLAVR warm start with the reference drop filters (train_all.py:350-356).

    allow_partial defaults True: the reference deliberately drop-filters
    head keys when re-purposing the public FLAVR_4x checkpoint, so partial
    matches are the expected case (quirk parity). The report still prints.
    """
    sd = drop_keys(strip_module_prefix(sd), drop or ())
    return _apply_mapping(flax_params, sd, flavr_mapping(use_uncertainty),
                          verbose, allow_partial=allow_partial, what="FLAVR")


# ------------------------------------------------------------------ SegModel

def segmodel_mapping(arch: dict) -> dict:
    m: dict[str, tuple] = {}
    n_stages = arch["n_stages"]

    def block(tbase, fbase):
        # dynamic_network_architectures ConvDropoutNormReLU registers its ops
        # both as attributes and inside .all_modules; accept both names.
        for alias in (f"{tbase}.conv", f"{tbase}.all_modules.0"):
            m[f"{alias}.weight"] = (fbase + ("conv", "kernel"), _conv_w)
            m[f"{alias}.bias"] = (fbase + ("conv", "bias"), lambda w: w)
        for alias in (f"{tbase}.norm", f"{tbase}.all_modules.1"):
            m[f"{alias}.weight"] = (fbase + ("norm", "scale"), lambda w: w)
            m[f"{alias}.bias"] = (fbase + ("norm", "bias"), lambda w: w)

    for s in range(n_stages):
        for i in range(arch["n_conv_per_stage"][s]):
            block(f"encoder.stages.{s}.convs.{i}",
                  ("encoder", f"stage_{s}", f"conv_{i}"))
    for s in range(n_stages - 1):
        m[f"decoder.transpconvs.{s}.weight"] = (
            ("decoder", f"transpconv_{s}", "kernel"), _convT_w)
        m[f"decoder.transpconvs.{s}.bias"] = (
            ("decoder", f"transpconv_{s}", "bias"), lambda w: w)
        for i in range(arch["n_conv_per_stage_decoder"][s]):
            block(f"decoder.stages.{s}.convs.{i}",
                  ("decoder", f"stage_{s}", f"conv_{i}"))
        m[f"decoder.seg_layers.{s}.weight"] = (
            ("decoder", f"seg_layer_{s}", "kernel"), _conv_w)
        m[f"decoder.seg_layers.{s}.bias"] = (
            ("decoder", f"seg_layer_{s}", "bias"), lambda w: w)
    m["sr_head.0.weight"] = (("sr_head_conv1", "kernel"), _conv_w)
    m["sr_head.0.bias"] = (("sr_head_conv1", "bias"), lambda w: w)
    m["sr_head.2.weight"] = (("sr_head_conv2", "kernel"), _conv_w)
    m["sr_head.2.bias"] = (("sr_head_conv2", "bias"), lambda w: w)
    return m


def import_segmodel(flax_params, sd: dict, arch: dict, verbose: bool = True,
                    allow_partial: bool | None = None):
    """nnUNet checkpoint import (train_all.py:496-499).

    The reference loads strict=False and silently drops whatever doesn't
    match — quirk parity for FLAVR, but a footgun for nnUNet where EVERY
    backbone tensor is expected to land: a silently-partial warm start
    trains from mostly-random weights while claiming a warm start. Default
    is therefore fail-loud on <90% match; pass allow_partial=True to keep
    the reference's permissive semantics. Small synthetic state dicts
    (fewer keys than the model — tests/tools) auto-allow, since partial is
    then self-evidently intended."""
    sd = strip_module_prefix(sd)
    mapping = segmodel_mapping(arch)
    if allow_partial is None:
        n_weightish = sum(1 for k in sd
                          if not any(s in k for s in _NON_WEIGHT))
        allow_partial = n_weightish < len(mapping) // 2
    return _apply_mapping(flax_params, sd, mapping, verbose,
                          allow_partial=allow_partial, what="nnUNet SegModel")


# --------------------------------------------------------------------- WDSR

def wdsr_mapping(n_resblocks: int) -> dict:
    m: dict[str, tuple] = {}

    def wn(tbase, *path):
        # torch weight_norm: weight_v (O, I, kh, kw), weight_g (O, 1, 1, 1)
        m[f"{tbase}.weight_v"] = (path + ("v",), _conv_w)
        m[f"{tbase}.weight_g"] = (path + ("g",), lambda w: w.reshape(-1))
        m[f"{tbase}.bias"] = (path + ("bias",), lambda w: w)

    wn("head", "head")
    for i in range(n_resblocks):
        wn(f"body.{i}.body.0", f"body_{i}", "conv_expand")
        wn(f"body.{i}.body.2", f"body_{i}", "conv_linear")
        wn(f"body.{i}.body.3", f"body_{i}", "conv_out")
    wn("tail.conv0", "tail", "conv0")
    wn("skip.conv0", "skip", "conv0")
    return m


def import_wdsr(flax_params, sd: dict, n_resblocks: int = 16,
                verbose: bool = True, allow_partial: bool = True):
    sd = strip_module_prefix(sd)
    return _apply_mapping(flax_params, sd, wdsr_mapping(n_resblocks), verbose,
                          allow_partial=allow_partial, what="WDSR")
