"""FLAVR UNet_3D_3D: 3D encoder-decoder for through-plane slice interpolation,
with optional uncertainty-aware SR (UASR) head.

Capability parity with the reference models/FLAVR/FLAVR_arch.py:117-247 and
resnet_3D.py:100-261: a video-ResNet-18 3D encoder (stem 3x7x7 stride (1,2,2);
4 layers of 2 BasicBlocks at widths 64/128/256/512; spatial stride 2 at
layers 2-3; temporal stride always 1; SEGating on every block), a transpose-
conv decoder with skip concatenation, a temporal fold of the n_inputs slices
into channels, and either a plain 2D head (feature_fuse + reflection-padded
7x7 outconv, tanh + batch-mean restore on the image channel) or the UASR head
(per-slice-candidate softmax attention over 16 hypotheses and a sigmoid
uncertainty map).

TPU-first: channels-last (B, D, H, W, C); the temporal fold is a reshape;
all convs map to XLA's native NDHWC convolutions; batchnorm is off in the
shipped config (identity), matching batchnorm=False.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import SEGating, conv_transpose_torch, leaky_relu, reflect_pad_2d

NF = (512, 256, 128, 64)


class BasicBlock3D(nn.Module):
    """resnet_3D.py:118-151 BasicBlock with SEGating, no batchnorm."""

    planes: int
    stride: Sequence[int] = (1, 1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        needs_downsample = (tuple(self.stride) != (1, 1, 1)
                            or x.shape[-1] != self.planes)
        out = nn.Conv(self.planes, (3, 3, 3), strides=tuple(self.stride),
                      padding=1, use_bias=self.use_bias, name="conv1")(x)
        out = jax.nn.relu(out)
        out = nn.Conv(self.planes, (3, 3, 3), strides=(1, 1, 1),
                      padding=1, use_bias=self.use_bias, name="conv2")(out)
        out = SEGating(name="fg")(out)
        residual = x
        if needs_downsample:
            residual = nn.Conv(self.planes, (1, 1, 1), strides=tuple(self.stride),
                               use_bias=False, name="downsample")(x)
        return jax.nn.relu(out + residual)


class Encoder3D(nn.Module):
    """unet_18 video-ResNet encoder returning 5 feature maps
    (resnet_3D.py:183-189)."""

    use_bias: bool = True
    layers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):
        x0 = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                     padding=((1, 1), (3, 3), (3, 3)),
                     use_bias=self.use_bias, name="stem")(x)
        x0 = jax.nn.relu(x0)

        def make_layer(h, planes, blocks, stride, name):
            h = BasicBlock3D(planes, stride, self.use_bias, name=f"{name}_0")(h)
            for b in range(1, blocks):
                h = BasicBlock3D(planes, (1, 1, 1), self.use_bias,
                                 name=f"{name}_{b}")(h)
            return h

        x1 = make_layer(x0, 64, self.layers[0], (1, 1, 1), "layer1")
        x2 = make_layer(x1, 128, self.layers[1], (1, 2, 2), "layer2")
        x3 = make_layer(x2, 256, self.layers[2], (1, 2, 2), "layer3")
        x4 = make_layer(x3, 512, self.layers[3], (1, 1, 1), "layer4")
        return x0, x1, x2, x3, x4


class Conv3dGated(nn.Module):
    """Conv_3d: 3x3x3 conv + SEGating (FLAVR_arch.py:72-88)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=True,
                    name="conv")(x)
        return SEGating(name="gate")(h)


class UpConv3D(nn.Module):
    """upConv3D transpose mode: ConvTranspose3d k(3,4,4) s(1,2,2) p(1,1,1)
    + SEGating (FLAVR_arch.py:40-70)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = conv_transpose_torch(x, self.features, (3, 4, 4), (1, 2, 2),
                                 (1, 1, 1), name="upconv", use_bias=True)
        return SEGating(name="gate")(h)


class UNet3D(nn.Module):
    """UNet_3D_3D (FLAVR_arch.py:117-247). Input (B, D, H, W, img_channels)."""

    img_channels: int = 2
    n_inputs: int = 4
    n_outputs: int = 4
    use_uncertainty: bool = False
    join_type: str = "concat"

    def setup(self):
        assert self.join_type == "concat", "only concat join is supported"
        self.encoder = Encoder3D(use_bias=self.n_outputs > 1, name="encoder")
        self.dec0 = Conv3dGated(NF[1], name="dec0")
        self.dec1 = UpConv3D(NF[2], name="dec1")
        self.dec2 = UpConv3D(NF[3], name="dec2")
        self.dec3 = Conv3dGated(NF[3], name="dec3")
        self.dec4 = UpConv3D(NF[3], name="dec4")

        fuse_out = NF[3] * self.n_inputs if self.use_uncertainty else NF[3]
        self.feature_fuse = nn.Conv(fuse_out, (3, 3), padding=1, use_bias=True,
                                    name="feature_fuse")
        if self.use_uncertainty:
            self.feature_fuse1 = nn.Conv(NF[3] * self.img_channels, (1, 1),
                                         use_bias=True, name="feature_fuse1")
            self.uncertainty_early = nn.Conv(NF[3], (1, 1), use_bias=True,
                                             name="uncertainty_early")
            self.uncertainty_out = nn.Conv(1, (1, 1, 1), use_bias=True,
                                           name="uncertainty_out")
        else:
            self.outconv = nn.Conv(self.n_outputs * self.img_channels, (7, 7),
                                   padding="VALID", use_bias=True, name="outconv")

    def encode(self, images):
        """KD-teacher interface: mean-centered encoder features
        (FLAVR_arch.py:180-186)."""
        images = self._center(images)[0]
        return self.encoder(images)

    def _center(self, images):
        mean_ = images[..., 0:1].mean(axis=(1, 2, 3), keepdims=True)
        centered = jnp.concatenate(
            [images[..., 0:1] - mean_, images[..., 1:]], axis=-1)
        return centered, mean_

    def __call__(self, images, return_intermediate_feature: bool = False):
        images, mean_ = self._center(images)

        x0, x1, x2, x3, x4 = self.encoder(images)
        if return_intermediate_feature:
            return x0, x1, x2, x3, x4

        dx3 = leaky_relu(self.dec0(x4), 0.2)
        dx3 = jnp.concatenate([dx3, x3], axis=-1)
        dx2 = leaky_relu(self.dec1(dx3), 0.2)
        dx2 = jnp.concatenate([dx2, x2], axis=-1)
        dx1 = leaky_relu(self.dec2(dx2), 0.2)
        dx1 = jnp.concatenate([dx1, x1], axis=-1)
        dx0 = leaky_relu(self.dec3(dx1), 0.2)
        dx0 = jnp.concatenate([dx0, x0], axis=-1)
        dx_out = leaky_relu(self.dec4(dx0), 0.2)

        # Temporal fold: (B, D, H, W, C) -> (B, H, W, D*C) with slice-major
        # channel order matching torch's cat(unbind(dim=2), dim=1)
        # (FLAVR_arch.py:201).
        b, d, h, w, c = dx_out.shape
        folded = dx_out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)

        if self.use_uncertainty:
            return self._uasr_head(folded)
        return self._plain_head(folded, mean_)

    def _plain_head(self, folded, mean_):
        out = leaky_relu(self.feature_fuse(folded), 0.2)
        out = reflect_pad_2d(out, 3)
        out = self.outconv(out)  # (B, H, W, n_outputs*img_channels)
        b, h, w, _ = out.shape
        # split into n_outputs chunks of img_channels (slice-major)
        out = out.reshape(b, h, w, self.n_outputs, self.img_channels)
        out = out.transpose(0, 3, 1, 2, 4)  # (B, n_out, H, W, C)
        mean2d = mean_[:, 0]  # (B, 1, 1, 1)
        if self.img_channels > 1:
            img = jnp.tanh(out[..., 0:1] + mean2d[:, None])
            out = jnp.concatenate([img, out[..., 1:]], axis=-1)
        else:
            out = out + mean2d[:, None]
        return out

    def _uasr_head(self, folded):
        """Uncertainty-aware head (FLAVR_arch.py:203-227,244-246): 16 slice
        hypotheses softmax-attended into the output, plus an uncertainty map."""
        fused = leaky_relu(self.feature_fuse(folded), 0.2)
        out_multi = self.feature_fuse1(fused)        # (B,H,W, 64*img_channels)
        unc_early = self.uncertainty_early(fused)    # (B,H,W, 64)

        b, h, w, _ = out_multi.shape
        n_out, ic = self.n_outputs, self.img_channels
        n_hyp = (NF[3] * ic) // n_out // ic          # 16 hypotheses
        # split into n_outputs chunks then stack: (B, n_out, H, W, ch)
        out_multi = out_multi.reshape(b, h, w, n_out, n_hyp * ic) \
                             .transpose(0, 3, 1, 2, 4)
        unc = unc_early.reshape(b, h, w, n_out, n_hyp).transpose(0, 3, 1, 2, 4)
        unc_softmax = jax.nn.softmax(unc, axis=-1)   # (B, n_out, H, W, 16)

        # pairs (img, seg) per hypothesis: channel 2i is image, 2i+1 is seg
        pairs = out_multi.reshape(b, n_out, h, w, n_hyp, ic)
        img = (jnp.tanh(pairs[..., 0]) + 1.0) / 2.0  # (B, n_out, H, W, 16)
        seg = pairs[..., 1]
        out_img = jnp.sum(img * unc_softmax, axis=-1, keepdims=True)
        out_seg = jnp.sum(seg * unc_softmax, axis=-1, keepdims=True)
        out = jnp.concatenate([out_img, out_seg], axis=-1)  # (B,n_out,H,W,2)

        uncertainty = jax.nn.sigmoid(self.uncertainty_out(unc_softmax))
        return out, uncertainty

    def calc_out_patch_size(self, input_patch_size):
        """Static output patch math (replaces dry-run, FLAVR_arch.py:158-167):
        spatial dims are preserved (stem /2 vs decoder x2 x2 x2 over /8), the
        slice dim becomes n_outputs and scales by n_inputs."""
        d, h, w = input_patch_size
        return [self.n_outputs * self.n_inputs, h, w]
