"""Shared flax building blocks for the REHRSeg-TPU model zoo.

All models use channels-last layouts (NHWC for 2D, NDHWC for 3D) — the native
XLA/TPU convolution layout — instead of the reference's torch NCHW/NCDHW.
Weight tensors are HWIO / DHWIO.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class WNConv(nn.Module):
    """Weight-normalized 2D convolution (torch ``weight_norm`` parity,
    reference models/wdsr.py:65).

    kernel = g * v / ||v|| with the norm over (H, W, I) per output channel,
    matching torch's default dim=0 on an OIHW weight. g initializes to ||v||
    so the initial kernel equals the raw initialization, as in torch.
    """

    features: int
    kernel_size: Sequence[int]
    padding: str | Sequence = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = (*self.kernel_size, in_features, self.features)
        v = self.param("v", nn.initializers.he_uniform(), kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jax.lax.stop_gradient(v) ** 2,
                                                axis=(0, 1, 2))),
            (self.features,),
        )
        # ||v|| in fp32 even under a bf16 compute policy (a sum of squares
        # over k*k*I terms loses digits in bf16), then back to v's dtype
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1, 2),
                                keepdims=True) + 1e-12).astype(v.dtype)
        kernel = g * v / norm
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b
        return out


class InstanceNorm(nn.Module):
    """InstanceNorm over all spatial dims, per sample and channel
    (torch InstanceNorm3d parity; used by the nnUNet-style SegModel,
    reference train_all.py:486)."""

    epsilon: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        spatial_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=spatial_axes, keepdims=True)
        var = jnp.var(x, axis=spatial_axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


class SEGating(nn.Module):
    """Squeeze-excite gating (reference models/FLAVR/resnet_3D.py:100-116):
    global average pool -> 1x1x1 conv -> sigmoid -> multiply."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        spatial_axes = tuple(range(1, x.ndim - 1))
        pooled = jnp.mean(x, axis=spatial_axes, keepdims=True)
        ksize = (1,) * (x.ndim - 2)
        y = nn.Conv(features=c, kernel_size=ksize, use_bias=True, name="attn")(pooled)
        return x * jax.nn.sigmoid(y)


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def reflect_pad_2d(x, pad: int):
    """ReflectionPad2d parity for NHWC tensors (reference FLAVR_arch.py:154)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv_transpose_torch(x, features: int, kernel_size, strides, padding,
                         name: str, use_bias: bool = True):
    """Helper computing torch-ConvTranspose-compatible flax padding.

    torch ConvTranspose output pads the dilated input by (k-1-p) low/high per
    dim; flax/lax conv_transpose takes that padding directly.
    """
    pads = tuple((k - 1 - p, k - 1 - p) for k, p in zip(kernel_size, padding))
    return nn.ConvTranspose(
        features=features, kernel_size=tuple(kernel_size), strides=tuple(strides),
        padding=pads, use_bias=use_bias, transpose_kernel=True, name=name,
    )(x)
