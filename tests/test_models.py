"""Shape/value tests for the flax model zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.models import WDSR, UNet3D, SegModel, Distiller, DEFAULT_ARCH


SMALL_ARCH = dict(
    n_stages=4,
    features_per_stage=(8, 16, 32, 32),
    kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    strides=((1, 1, 1), (1, 2, 2), (2, 2, 2), (1, 2, 2)),
    n_conv_per_stage=(2, 2, 2, 2),
    n_conv_per_stage_decoder=(2, 2, 2),
    conv_bias=True,
    norm_eps=1e-5,
    norm_affine=True,
    nonlin_slope=0.01,
)


def test_wdsr_forward_shape(rng):
    model = WDSR(out_channel=2, n_resblocks=2, num_channels=8, scale=4.0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32, 16, 2)
    assert model.calc_out_patch_size([8, 16]) == [32, 16]


def test_wdsr_fractional_scale(rng):
    model = WDSR(out_channel=2, n_resblocks=1, num_channels=8, scale=2.5)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    # scale0=1.25 → pre-resize to round(8*1.25)=10, then shuffle x2 → 20
    assert out.shape == (1, 20, 8, 2)
    assert model.calc_out_patch_size([8, 8]) == [20, 8]


def test_wdsr_weight_norm_init_matches_raw(rng):
    """g initialized to ||v|| makes the effective kernel equal v at init."""
    from rehrseg_tpu.models.layers import WNConv
    conv = WNConv(features=4, kernel_size=(3, 3))
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    params = conv.init(jax.random.key(1), x)
    v = params["params"]["v"]
    g = params["params"]["g"]
    assert np.allclose(g, np.sqrt((np.asarray(v) ** 2).sum(axis=(0, 1, 2))),
                       rtol=1e-6)


def test_flavr_plain_forward(rng):
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=False)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 32, 32, 2)
    # image channel is tanh-bounded
    assert np.all(np.abs(np.asarray(out[..., 0])) <= 1.0 + 1e-6)
    assert model.calc_out_patch_size([4, 32, 32]) == [16, 32, 32]


def test_flavr_uncertainty_forward(rng):
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4,
                   use_uncertainty=True)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out, unc = model.apply(params, x)
    assert out.shape == (1, 4, 32, 32, 2)
    assert unc.shape == (1, 4, 32, 32, 1)
    assert np.all(np.asarray(unc) > 0) and np.all(np.asarray(unc) < 1)
    # image channel of the UASR head is a softmax-weighted average of
    # (tanh+1)/2 values, hence in [0, 1]
    assert np.all(np.asarray(out[..., 0]) >= 0)
    assert np.all(np.asarray(out[..., 0]) <= 1)


def test_flavr_intermediate_features(rng):
    model = UNet3D(img_channels=2, n_inputs=4, n_outputs=4)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    feats = model.apply(params, x, return_intermediate_feature=True)
    assert len(feats) == 5
    # stem /2 spatial; layer1 64ch; layer2 /4 128ch; layer3 /8 256; layer4 512
    assert feats[0].shape == (1, 4, 16, 16, 64)
    assert feats[1].shape == (1, 4, 16, 16, 64)
    assert feats[2].shape == (1, 4, 8, 8, 128)
    assert feats[3].shape == (1, 4, 4, 4, 256)
    assert feats[4].shape == (1, 4, 4, 4, 512)


def test_segmodel_forward(rng):
    model = SegModel(num_classes=2, upscale=4, arch=SMALL_ARCH)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out, out_up = model.apply(params, x)
    assert out.shape == (1, 4, 16, 16, 2)
    assert out_up.shape == (1, 16, 16, 16, 2)
    out, out_up, skips = model.apply(params, x, return_intermediate_feature=True)
    assert len(skips) == 4
    assert skips[0].shape == (1, 4, 16, 16, 8)
    assert skips[1].shape == (1, 4, 8, 8, 16)


def test_segmodel_default_arch_matches_nnunet_geometry(rng):
    model = SegModel(num_classes=2, upscale=4, arch=dict(DEFAULT_ARCH))
    x = jnp.asarray(rng.normal(size=(1, 8, 64, 64, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out, out_up = model.apply(params, x)
    assert out.shape == (1, 8, 64, 64, 2)
    assert out_up.shape == (1, 32, 64, 64, 2)


def test_conv_transpose_matches_torch(rng):
    """Alignment parity of conv_transpose_torch with torch ConvTranspose3d
    (FLAVR upConv3D geometry: k(3,4,4) s(1,2,2) p(1,1,1))."""
    import torch
    import flax.linen as nn
    from rehrseg_tpu.models.layers import conv_transpose_torch

    class TC(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv_transpose_torch(x, 3, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                                        name="up")

    x = rng.normal(size=(1, 4, 6, 6, 2)).astype(np.float32)
    mod = TC()
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (1, 4, 12, 12, 3)

    # torch oracle with identical weights
    kernel = np.asarray(params["params"]["up"]["kernel"])  # flax: (D,H,W,O,I) when transpose_kernel=True
    bias = np.asarray(params["params"]["up"]["bias"])
    tconv = torch.nn.ConvTranspose3d(2, 3, (3, 4, 4), stride=(1, 2, 2),
                                     padding=(1, 1, 1))
    with torch.no_grad():
        # flax transpose_kernel=True stores (D, H, W, O, I); torch wants
        # (I, O, D, H, W) — a pure transpose, no spatial flip
        w = kernel.transpose(4, 3, 0, 1, 2)
        tconv.weight.copy_(torch.from_numpy(w.copy()))
        tconv.bias.copy_(torch.from_numpy(bias))
        xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        ref = tconv(xt).numpy().transpose(0, 2, 3, 4, 1)
    assert ref.shape == out.shape
    assert np.allclose(out, ref, atol=1e-4)


def test_distiller_forward_and_grads(rng):
    dist = Distiller(64, 64, lambda_l1=0.0, lambda_cosine=1.0,
                     lambda_structure=1.0)
    fs = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 64)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 64)).astype(np.float32))
    params = dist.init(jax.random.key(0), fs, ft)
    loss = dist.apply(params, fs, ft)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # identical features → structural and cosine terms vanish
    loss_same = dist.apply(params, fs, fs)
    # cosine of projected vs raw isn't zero, but structural term is;
    # check structural-only configuration exactly:
    dist_s = Distiller(64, 64, 0.0, 0.0, 1.0)
    params_s = dist_s.init(jax.random.key(0), fs, ft)
    assert float(dist_s.apply(params_s, fs, fs)) == pytest.approx(0.0, abs=1e-8)
    assert np.isfinite(float(loss_same))

    # gradients flow to student only
    def f(feats):
        return dist.apply(params, feats, ft)
    g = jax.grad(f)(fs)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_distiller_maxpool_ceil_matches_torch(rng):
    import torch
    from rehrseg_tpu.models.distiller import _maxpool2d_ceil
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    out = np.asarray(_maxpool2d_ceil(jnp.asarray(x), 3, 4))
    ref = torch.nn.MaxPool2d((3, 4), stride=(3, 4), ceil_mode=True)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert out.shape == ref.shape
    assert np.allclose(out, ref)


def test_segating_gates_by_global_stats(rng):
    from rehrseg_tpu.models.layers import SEGating
    g = SEGating()
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 8)).astype(np.float32))
    params = g.init(jax.random.key(0), x)
    out = g.apply(params, x)
    assert out.shape == x.shape
    # gate is spatially constant per (batch, channel): ratio out/x constant
    ratio = np.asarray(out / x)
    assert np.allclose(ratio, ratio[:, :1, :1, :1, :], atol=1e-5)
