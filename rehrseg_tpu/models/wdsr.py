"""WDSR wide-activation super-resolution network (flax, NHWC).

Capability parity with the reference models/wdsr.py:58-95: weight-normalized
convs, 16 residual blocks (1x1 expand x4 -> ReLU -> 1x1 linear x0.8 -> 3x3),
pixel-shuffle-along-one-axis upsampling head plus a 5x5 skip upsampler, and
rational scales split into an integer pixel-shuffle part and a fractional
B-spline pre-resize (wdsr.py:61-62,87). TPU-first: channels-last layout, the
fractional pre-resize is a precomputed-matrix matmul
(:func:`rehrseg_tpu.ops.bspline.resize_1d_jax`), pixel shuffle is a pure
reshape/transpose.

Input/output: (B, X, Y, C) with C = out_channel (image+label = 2). The first
spatial axis X is the through-plane (upsampled) axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bspline import resize_1d_jax
from ..ops.pixel_shuffle import pixel_shuffle_axis
from .layers import WNConv


class Upsample(nn.Module):
    """Conv to scale*out_channel then 1-D pixel shuffle (wdsr.py:23-34)."""

    out_channel: int
    scale: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        out = WNConv(features=self.scale * self.out_channel,
                     kernel_size=(self.kernel_size, self.kernel_size),
                     name="conv0")(x)
        # torch channel index = c_out*scale + phase... torch conv0 emits
        # scale*out_channel with shuffle using num_channels//scale as c_out:
        # channel = c_out * scale + phase. Our WNConv emits the same ordering
        # as torch would only if we match it — see pixel_shuffle_axis.
        return pixel_shuffle_axis(out, self.scale)


class Block(nn.Module):
    """Wide-activation residual block (wdsr.py:37-55)."""

    n_feats: int
    res_scale: float = 1.0
    expand: int = 4
    linear: float = 0.8

    @nn.compact
    def __call__(self, x):
        h = WNConv(self.n_feats * self.expand, (1, 1), name="conv_expand")(x)
        h = jax.nn.relu(h)
        h = WNConv(int(self.n_feats * self.linear), (1, 1), name="conv_linear")(h)
        h = WNConv(self.n_feats, (3, 3), name="conv_out")(h)
        return x + h * self.res_scale


class WDSR(nn.Module):
    out_channel: int = 2
    n_resblocks: int = 16
    num_channels: int = 32
    scale: float = 4.0

    @property
    def scale1(self) -> int:
        return int(self.scale)

    @property
    def scale0(self) -> float:
        return self.scale / float(self.scale1)

    @nn.compact
    def __call__(self, x):
        # Fractional pre-resize along the through-plane axis (wdsr.py:87)
        if self.scale0 != 1.0:
            x = resize_1d_jax(x, 1.0 / self.scale0, axis=1, order=3)

        s = Upsample(self.out_channel, self.scale1, kernel_size=5, name="skip")(x)

        h = WNConv(self.num_channels, (3, 3), name="head")(x)
        for i in range(self.n_resblocks):
            h = Block(self.num_channels, name=f"body_{i}")(h)
        h = Upsample(self.out_channel, self.scale1, kernel_size=3, name="tail")(h)
        return h + s

    def calc_out_patch_size(self, input_patch_size):
        """Static output patch math (replaces the reference's dry-run forward,
        wdsr.py:79-84): X scales by round(n/ (1/scale0)) * scale1, Y unchanged."""
        nx, ny = input_patch_size
        if self.scale0 != 1.0:
            nx = int(round(nx * self.scale0))
        return [nx * self.scale1, ny]
