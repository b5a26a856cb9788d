"""SegModel: configurable plain-conv 3D UNet with an SR head.

Capability parity with the reference models/seg_model.py:14-58,153-210, which
builds on nnunetv2's PlainConvUNet/UNetDecoder: encoder/decoder geometry
(stages, features, kernels, strides, convs-per-stage) comes from nnUNet
``plans.json`` arch_kwargs (reference train_all.py:473-493); the decoder taps
its last-stage (highest-res) features; the SR head linearly upsamples those
features along the through-plane axis by ``upscale`` (align_corners=True,
seg_model.py:204) and predicts HR logits with a 3x3x3 -> ReLU -> 5x5x5 conv
stack.

TPU-first: channels-last (B, D, H, W, C); the trilinear z-upsample is a
precomputed-matrix matmul (ops.bspline.upsample_axis_linear); InstanceNorm is
a fused normalize-scale-bias.
"""

from __future__ import annotations

from dataclasses import field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import InstanceNorm, leaky_relu, conv_transpose_torch


def _to_tuple3(v):
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)


DEFAULT_ARCH = dict(
    n_stages=6,
    features_per_stage=(32, 64, 128, 256, 320, 320),
    kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    strides=((1, 1, 1), (1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2)),
    n_conv_per_stage=(2, 2, 2, 2, 2, 2),
    n_conv_per_stage_decoder=(2, 2, 2, 2, 2),
    conv_bias=True,
    norm_eps=1e-5,
    norm_affine=True,
    nonlin_slope=0.01,
)


class ConvNormAct(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_affine: bool = True
    nonlin_slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        h = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=pad,
                    use_bias=self.conv_bias, name="conv")(x)
        h = InstanceNorm(epsilon=self.norm_eps, use_affine=self.norm_affine,
                         name="norm")(h)
        return leaky_relu(h, self.nonlin_slope)


class StackedConvs(nn.Module):
    features: int
    kernel_size: Sequence[int]
    n_convs: int
    first_stride: Sequence[int] = (1, 1, 1)
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_affine: bool = True
    nonlin_slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            stride = self.first_stride if i == 0 else (1, 1, 1)
            x = ConvNormAct(self.features, self.kernel_size, stride,
                            self.conv_bias, self.norm_eps, self.norm_affine,
                            self.nonlin_slope, name=f"conv_{i}")(x)
        return x


class PlainConvEncoder(nn.Module):
    arch: dict

    @nn.compact
    def __call__(self, x):
        a = self.arch
        skips = []
        for s in range(a["n_stages"]):
            x = StackedConvs(
                features=a["features_per_stage"][s],
                kernel_size=_to_tuple3(a["kernel_sizes"][s]),
                n_convs=a["n_conv_per_stage"][s],
                first_stride=_to_tuple3(a["strides"][s]),
                conv_bias=a["conv_bias"], norm_eps=a["norm_eps"],
                norm_affine=a["norm_affine"], nonlin_slope=a["nonlin_slope"],
                name=f"stage_{s}")(x)
            skips.append(x)
        return skips


class UNetDecoder(nn.Module):
    """Decoder exposing last-stage features (reference MyUnetDecoder,
    seg_model.py:14-58)."""

    arch: dict
    num_classes: int
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, skips):
        a = self.arch
        n_stages = a["n_stages"]
        lres = skips[-1]
        seg_outputs = []
        features = None
        for s in range(n_stages - 1):
            stride = _to_tuple3(a["strides"][n_stages - 1 - s])
            out_ch = a["features_per_stage"][n_stages - 2 - s]
            x = conv_transpose_torch(lres, out_ch, stride, stride,
                                     (0, 0, 0), name=f"transpconv_{s}",
                                     use_bias=a["conv_bias"])
            x = jnp.concatenate([x, skips[n_stages - 2 - s]], axis=-1)
            x = StackedConvs(
                features=out_ch,
                kernel_size=_to_tuple3(a["kernel_sizes"][n_stages - 2 - s]),
                n_convs=a["n_conv_per_stage_decoder"][s],
                conv_bias=a["conv_bias"], norm_eps=a["norm_eps"],
                norm_affine=a["norm_affine"], nonlin_slope=a["nonlin_slope"],
                name=f"stage_{s}")(x)
            if s == n_stages - 2:
                features = x
            if self.deep_supervision:
                seg_outputs.append(
                    nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                            name=f"seg_layer_{s}")(x))
            elif s == n_stages - 2:
                seg_outputs.append(
                    nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                            name=f"seg_layer_{s}")(x))
            lres = x
        seg_outputs = seg_outputs[::-1]
        r = seg_outputs if self.deep_supervision else seg_outputs[0]
        return r, features


class SegModel(nn.Module):
    """Full LR-seg + HR-SR-seg model (reference seg_model.py:153-210).

    Input (B, D, H, W, input_channels); returns (lr_logits, hr_logits[,
    skips]) with hr_logits upsampled x``upscale`` along D.
    """

    num_classes: int = 2
    upscale: int = 4
    input_channels: int = 1
    arch: dict = field(default_factory=lambda: dict(DEFAULT_ARCH))
    deep_supervision: bool = False

    def setup(self):
        self.encoder = PlainConvEncoder(self.arch, name="encoder")
        self.decoder = UNetDecoder(self.arch, self.num_classes,
                                   self.deep_supervision, name="decoder")
        self.sr_conv1 = nn.Conv(16, (3, 3, 3), padding=1, use_bias=True,
                                name="sr_head_conv1")
        self.sr_conv2 = nn.Conv(self.num_classes, (5, 5, 5), padding=2,
                                use_bias=True, name="sr_head_conv2")

    def __call__(self, x, return_intermediate_feature: bool = False):
        from ..ops.bspline import upsample_axis_linear

        skips = self.encoder(x)
        out, features = self.decoder(skips)
        up = upsample_axis_linear(features, self.upscale, axis=1,
                                  align_corners=True)
        out_up = self.sr_conv2(jax.nn.relu(self.sr_conv1(up)))
        if return_intermediate_feature:
            return out, out_up, skips
        return out, out_up


def arch_from_plans(plans: dict, configuration: str = "3d_fullres") -> tuple[dict, list]:
    """Extract arch kwargs + patch size from an nnUNet plans.json dict
    (reference train_all.py:466-493).

    Note nnUNet patch sizes are stored (D, H, W); the reference reverses them
    for its own (x, y, z) convention (train_all.py:469).
    """
    cfg = plans["configurations"][configuration]
    ak = cfg["architecture"]["arch_kwargs"]
    arch = dict(
        n_stages=ak["n_stages"],
        features_per_stage=tuple(ak["features_per_stage"]),
        kernel_sizes=tuple(tuple(k) for k in ak["kernel_sizes"]),
        strides=tuple(tuple(s) for s in ak["strides"]),
        n_conv_per_stage=tuple(ak["n_conv_per_stage"]) if not isinstance(
            ak["n_conv_per_stage"], int) else (ak["n_conv_per_stage"],) * ak["n_stages"],
        n_conv_per_stage_decoder=tuple(ak["n_conv_per_stage_decoder"]) if not isinstance(
            ak["n_conv_per_stage_decoder"], int)
        else (ak["n_conv_per_stage_decoder"],) * (ak["n_stages"] - 1),
        conv_bias=ak.get("conv_bias", True),
        norm_eps=(ak.get("norm_op_kwargs") or {}).get("eps", 1e-5),
        norm_affine=(ak.get("norm_op_kwargs") or {}).get("affine", True),
        nonlin_slope=(ak.get("nonlin_kwargs") or {}).get("negative_slope", 0.01),
    )
    patch_size = list(cfg["patch_size"])
    return arch, patch_size
