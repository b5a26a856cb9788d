"""Exactness tests for the space-to-depth packed conv primitives
(ops.pack2d): every packed op must reproduce its unpacked counterpart to
float tolerance — the packed eval path is a layout change, not an
approximation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rehrseg_tpu.ops.pack2d import (
    space_to_depth_hw, depth_to_space_hw, offset_pack_hw, aligned_to_offset_hw,
    pack_conv_weights, pack_transpconv_weights, pack_bias,
    conv_packed, pointwise_packed_transpconv, instance_norm_packed,
)


def _conv_ref(x, w, strides=(1, 1, 1)):
    """The unpacked ConvNormAct conv: SAME-style torch padding k//2."""
    pad = tuple((k // 2, k // 2) for k in w.shape[:3])
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 10, 5)).astype(np.float32))
    xp = space_to_depth_hw(x)
    assert xp.shape == (2, 3, 4, 5, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space_hw(xp)),
                                  np.asarray(x))
    # channel order (dy, dx, c)
    np.testing.assert_array_equal(np.asarray(xp[0, 0, 1, 2, 5:10]),
                                  np.asarray(x[0, 0, 2, 5, :]))  # dy0 dx1


@pytest.mark.parametrize("kd", [1, 3])
def test_packed_conv_stride1(rng, kd):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, 3, 5)).astype(np.float32))
    ref = _conv_ref(x, w)
    yp = conv_packed(offset_pack_hw(x), pack_conv_weights(w), None)
    got = depth_to_space_hw(yp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kd,ds", [(3, 1), (3, 2), (1, 1)])
def test_packed_conv_strided(rng, kd, ds):
    """stride (ds, 2, 2): packed conv with unpacked output at half res."""
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, 3, 5)).astype(np.float32))
    ref = _conv_ref(x, w, strides=(ds, 2, 2))
    wp = pack_conv_weights(w, packed_out=False)
    got = conv_packed(offset_pack_hw(x), wp, None, d_stride=ds)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_concat_splits(rng):
    """Concat of two packed tensors + packed conv == concat + SAME conv."""
    a = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 7, 6)).astype(np.float32))
    ref = _conv_ref(jnp.concatenate([a, b], axis=-1), w)
    # offset-repack PER TENSOR, then concat: depth_to_space on a concat of
    # packed tensors would scramble (the (dy,dx,c) order doesn't span the
    # concat boundary) — the packed model must follow the same rule
    xp = jnp.concatenate([aligned_to_offset_hw(space_to_depth_hw(a)),
                          aligned_to_offset_hw(space_to_depth_hw(b))],
                         axis=-1)
    wp = pack_conv_weights(w, in_splits=[3, 4])
    got = depth_to_space_hw(conv_packed(xp, wp, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kd", [1, 2])
def test_packed_transpconv(rng, kd):
    """Pointwise packed form == flax ConvTranspose(kernel==stride)."""
    import flax.linen as nn
    from rehrseg_tpu.models.layers import conv_transpose_torch

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv_transpose_torch(x, 5, (kd, 2, 2), (kd, 2, 2),
                                        (0, 0, 0), name="t", use_bias=True)

    x = jnp.asarray(rng.normal(size=(2, 3, 4, 6, 3)).astype(np.float32))
    m = M()
    p = m.init(jax.random.key(0), x)
    ref = m.apply(p, x)
    wt = p["params"]["t"]["kernel"]
    bias = p["params"]["t"]["bias"]
    yp = pointwise_packed_transpconv(x, pack_transpconv_weights(wt),
                                     pack_bias(bias))
    got = depth_to_space_hw(yp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_packed(rng):
    from rehrseg_tpu.models.layers import InstanceNorm

    x = jnp.asarray(rng.normal(size=(2, 3, 8, 10, 4)).astype(np.float32) * 3)
    norm = InstanceNorm(epsilon=1e-5, use_affine=True)
    p = norm.init(jax.random.key(0), x)
    scale = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    p = {"params": {"scale": scale, "bias": bias}}
    ref = norm.apply(p, x)
    got = depth_to_space_hw(
        instance_norm_packed(space_to_depth_hw(x), scale, bias, 1e-5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_packed_bias(rng):
    x = jnp.asarray(rng.normal(size=(1, 2, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 3, 3, 3, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    pad = ((0, 0), (1, 1), (1, 1))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = depth_to_space_hw(conv_packed(offset_pack_hw(x),
                                        pack_conv_weights(w), pack_bias(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_aligned_to_offset_direct_equals_roundtrip(rng):
    from rehrseg_tpu.ops.pack2d import offset_to_unpacked_hw
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 10, 4)).astype(np.float32))
    xp = space_to_depth_hw(x)
    direct = aligned_to_offset_hw(xp)
    roundtrip = offset_pack_hw(depth_to_space_hw(xp))
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(roundtrip))
    # offset -> unpacked strips the rim exactly
    np.testing.assert_array_equal(np.asarray(offset_to_unpacked_hw(direct)),
                                  np.asarray(x))


@pytest.mark.parametrize("kd", [1, 3])
def test_packed_conv_aligned_to_offset_parity(rng, kd):
    """aligned->offset conv (pad11) uses the SAME packed weights as
    offset->aligned (valid) — the zero-repack alternating-parity identity."""
    from rehrseg_tpu.ops.pack2d import offset_to_unpacked_hw
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, 3, 5)).astype(np.float32))
    ref = _conv_ref(x, w)
    wp = pack_conv_weights(w)
    y_off = conv_packed(space_to_depth_hw(x), wp, None, hw_pad="pad11")
    assert y_off.shape[2] == 5 and y_off.shape[3] == 7
    got = offset_to_unpacked_hw(y_off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kd,ds", [(3, 1), (3, 2), (1, 1)])
def test_packed_conv_strided_from_aligned(rng, kd, ds):
    """strided conv consuming ALIGNED input (pad10 + shifted tap map)."""
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, 3, 5)).astype(np.float32))
    ref = _conv_ref(x, w, strides=(ds, 2, 2))
    wp = pack_conv_weights(w, packed_out=False, aligned_in_strided=True)
    got = conv_packed(space_to_depth_hw(x), wp, None, d_stride=ds,
                      hw_pad="pad10")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kd", [1, 3])
@pytest.mark.parametrize("offset_out", [False, True])
def test_conv_packing_from_unpacked(rng, kd, offset_out):
    """(4,4) stride-2 conv == stride-1 SAME conv with packed output (the
    zero-layout-op unpacked->packed transition)."""
    from rehrseg_tpu.ops.pack2d import (pack_conv_weights_from_unpacked,
                                        conv_packing, offset_to_unpacked_hw)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kd, 3, 3, 3, 5)).astype(np.float32))
    ref = _conv_ref(x, w)
    w4 = pack_conv_weights_from_unpacked(w)
    y = conv_packing(x, w4, None, offset_out=offset_out)
    if offset_out:
        assert y.shape[2:4] == (5, 7)
        got = offset_to_unpacked_hw(y)
    else:
        assert y.shape[2:4] == (4, 6)
        got = depth_to_space_hw(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_offset_rim_mask_and_norm_parity(rng):
    """Masked offset tensor + corrected-count norm == aligned-path norm."""
    from rehrseg_tpu.ops.pack2d import offset_rim_mask
    from rehrseg_tpu.models.layers import InstanceNorm

    x = jnp.asarray(rng.normal(size=(2, 3, 8, 12, 4)).astype(np.float32) * 2)
    norm = InstanceNorm(epsilon=1e-5, use_affine=True)
    scale = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    ref = norm.apply({"params": {"scale": scale, "bias": bias}}, x)

    xo = offset_pack_hw(x)  # rim is exactly zero by construction here
    m = offset_rim_mask(xo.shape[2], xo.shape[3], 4, xo.dtype)
    got_o = instance_norm_packed(xo * m, scale, bias, 1e-5,
                                 offset_parity=True) * m
    from rehrseg_tpu.ops.pack2d import offset_to_unpacked_hw
    np.testing.assert_allclose(np.asarray(offset_to_unpacked_hw(got_o)),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pack_pointwise_weights(rng):
    from rehrseg_tpu.ops.pack2d import pack_pointwise_weights
    x = jnp.asarray(rng.normal(size=(1, 2, 6, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    ref = jnp.einsum("bdhwc,ce->bdhwe", x, w)
    xp = space_to_depth_hw(x)
    got = depth_to_space_hw(
        jnp.einsum("bdhwc,ce->bdhwe", xp, pack_pointwise_weights(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_5x5_offset_to_aligned(rng):
    """5x5 conv == (4,4)-cell packed conv on offset input (the SR head's
    sr_conv2)."""
    x = jnp.asarray(rng.normal(size=(1, 3, 10, 14, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 5, 3, 4)).astype(np.float32))
    pad = tuple((k // 2, k // 2) for k in w.shape[:3])
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    wp = pack_conv_weights(w)
    assert wp.shape[:3] == (5, 4, 4)
    got = depth_to_space_hw(conv_packed(offset_pack_hw(x), wp, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kd", [1, 5])
def test_packed_conv_s2_cell4(rng, kd):
    """The stride-2 (4,4)-cell 5x5 conv (offset in -> aligned cell-4 out)
    == SAME 5x5 conv + (4,4) space-to-depth. This is the sr_head conv2
    formulation that lifts the MXU output-lane count 8 -> 32 (round-4
    VERDICT item #3; reference conv at seg_model.py:196-210)."""
    from rehrseg_tpu.ops.pack2d import (
        pack_conv_weights_cell4, pack_bias_cell4, conv_packed_s2_cell4,
        depth_to_space_cell)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 24, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kd, 5, 5, 3, 2)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    ref = _conv_ref(x, w) + b
    yp = conv_packed_s2_cell4(offset_pack_hw(x), pack_conv_weights_cell4(w),
                              pack_bias_cell4(b))
    assert yp.shape == (2, 4, 4, 6, 32)
    got = depth_to_space_cell(yp, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # per-class plane slicing used by plane_out: channels c::ncl are the 16
    # (ey, ex) cells of class c
    pl = depth_to_space_cell(yp[..., 1::2], 4)[..., 0]
    np.testing.assert_allclose(np.asarray(pl), np.asarray(ref[..., 1]),
                               rtol=1e-4, atol=1e-4)


def test_packed_conv_s2_cell4z2(rng):
    """The z-paired stride-(2,2,2) variant: one conv == SAME 5^3 conv +
    (4,4) hw space-to-depth + z-pairing (64 output lanes for the 2-class
    sr_head — experiments/conv2_lanes.py)."""
    from rehrseg_tpu.ops.pack2d import (
        pack_conv_weights_cell4z2, conv_packed_s2_cell4z2, unpack_cell4z2,
        pack_bias_cell4z2)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 24, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 5, 3, 2)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    ref = _conv_ref(x, w) + b
    yp = conv_packed_s2_cell4z2(offset_pack_hw(x),
                                pack_conv_weights_cell4z2(w),
                                pack_bias_cell4z2(b))
    assert yp.shape == (2, 4, 4, 6, 64)
    planes = unpack_cell4z2(yp, 2)
    got = jnp.stack(planes, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_upsample_conv1(rng):
    """Swap-order fusion (2D conv at LR depth + composite z-matmul) must
    equal z-upsample followed by the SAME 3^3 packed conv (sr_head conv1,
    reference seg_model.py:196-210 F.interpolate + Conv3d)."""
    from rehrseg_tpu.ops.pack2d import fused_upsample_conv1
    from rehrseg_tpu.ops.bspline import upsample_axis_linear
    x = jnp.asarray(rng.normal(size=(2, 3, 6, 8, 4)).astype(np.float32))
    xp = space_to_depth_hw(x)                      # aligned (2,3,3,4,16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    up = upsample_axis_linear(xp, 4, axis=1, align_corners=True)
    ref = conv_packed(up, pack_conv_weights(w), pack_bias(b),
                      hw_pad="pad11")
    got = fused_upsample_conv1(xp, w, b, 4)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
