"""Exactness tests for the production stride-1 packed-conv Pallas kernels
(ops/pallas_pconv.py) against the XLA conv_packed path, in interpret mode
on the CPU mesh. Tolerances cover the accumulation-dtype difference (the
kernel accumulates fp32; conv_packed accumulates at bf16 preferred type).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rehrseg_tpu.ops.pack2d import (
    offset_pack_hw, space_to_depth_hw, pack_conv_weights, pack_bias,
    conv_packed, offset_rim_mask)
from rehrseg_tpu.ops.pallas_pconv import pconv_valid, pconv_pad11


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


def test_pconv_valid_matches_conv_packed(rng):
    """offset (N, hp, wp8, 4Ci) -> aligned: equals the XLA VALID packed
    conv on the true wp columns, with zero pad columns ignored."""
    n, d, h, w, ci, co = 2, 3, 16, 32, 32, 32
    x = _mk(rng, (n, d, h, w, ci))
    xo = offset_pack_hw(x)                    # (n, d, h/2+1, w/2+1, 4ci)
    true_wp = xo.shape[3]
    wp8 = -(-true_wp // 8) * 8
    xo8 = jnp.pad(xo, ((0, 0), (0, 0), (0, 0), (0, wp8 - true_wp),
                       (0, 0))).reshape(n * d, xo.shape[2], wp8, -1)
    w3 = _mk(rng, (1, 3, 3, ci, co)) * 0.2
    b = _mk(rng, (co,)) * 0.1
    wp = pack_conv_weights(w3)[0]                # (2, 2, 4ci, 4co)

    want = conv_packed(xo, pack_conv_weights(w3), pack_bias(b))

    got = pconv_valid(xo8, wp, pack_bias(b), w_out=true_wp - 1,
                      interpret=True)
    assert got is not None
    got = got.reshape(want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pconv_valid_pad_columns_ignored(rng):
    """Garbage in the pad columns beyond w_out + 1 must not leak into the
    output (taps only read cols <= w_out)."""
    n, d, h, w, ci = 1, 2, 8, 32, 32
    x = _mk(rng, (n, d, h, w, ci))
    xo = offset_pack_hw(x)
    true_wp = xo.shape[3]
    wp8 = -(-true_wp // 8) * 8
    pad = jnp.full((n, d, xo.shape[2], wp8 - true_wp, 4 * ci), 777.0)
    xo8 = jnp.concatenate([xo, pad], axis=3).reshape(
        n * d, xo.shape[2], wp8, -1)
    w3 = _mk(rng, (1, 3, 3, ci, ci)) * 0.2
    wp = pack_conv_weights(w3)[0]
    want = conv_packed(xo, pack_conv_weights(w3), None)
    got = pconv_valid(xo8, wp, None, w_out=true_wp - 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                               np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pconv_valid_bf16(rng):
    n, d, h, w, ci, co = 2, 2, 16, 32, 32, 64
    x = _mk(rng, (n, d, h, w, ci), jnp.bfloat16)
    xo = offset_pack_hw(x)
    true_wp = xo.shape[3]
    wp8 = -(-true_wp // 8) * 8
    xo8 = jnp.pad(xo, ((0, 0), (0, 0), (0, 0), (0, wp8 - true_wp),
                       (0, 0))).reshape(n * d, xo.shape[2], wp8, -1)
    w3 = _mk(rng, (1, 3, 3, ci, co), jnp.bfloat16) * 0.2
    wp = pack_conv_weights(w3)[0]
    want = conv_packed(xo, pack_conv_weights(w3), None)
    got = pconv_valid(xo8, wp, None, w_out=true_wp - 1, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32).reshape(want.shape),
        np.asarray(want, np.float32), rtol=0.04, atol=0.04)


def test_pconv_pad11_matches_conv_packed(rng):
    """aligned (N, h, w, 4Ci) -> offset at wp8 width: true columns equal
    the XLA pad11 conv; pad columns are exact zeros. Both tall (h+1 odd)
    and the one-row epilogue are covered."""
    n, d, h, w, ci, co = 2, 2, 16, 32, 32, 32
    x = _mk(rng, (n, d, h, w, ci))
    xa = space_to_depth_hw(x)                 # (n, d, h/2, w/2, 4ci)
    w3 = _mk(rng, (1, 3, 3, ci, co)) * 0.2
    b = _mk(rng, (co,)) * 0.1
    wp = pack_conv_weights(w3)[0]

    want = conv_packed(xa, pack_conv_weights(w3), pack_bias(b),
                       hw_pad="pad11")        # (n, d, h/2+1, w/2+1, 4co)
    xf = xa.reshape(n * d, *xa.shape[2:])
    got = pconv_pad11(xf, wp, pack_bias(b), interpret=True)
    assert got is not None
    true_wp = want.shape[3]
    assert got.shape[2] == -(-true_wp // 8) * 8
    got = got.reshape(n, d, got.shape[1], got.shape[2], -1)
    np.testing.assert_allclose(np.asarray(got[:, :, :, :true_wp]),
                               np.asarray(want), rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got[:, :, :, true_wp:]) == 0.0)


def test_pconv_pad11_rim_then_mask_roundtrip(rng):
    """The engine applies offset_rim_mask after the pad11 conv; the padded
    kernel output followed by a wp8-extended mask must equal the XLA conv
    followed by the standard mask on the true columns."""
    n, d, h, w, ci = 1, 2, 8, 16, 32
    x = _mk(rng, (n, d, h, w, ci))
    xa = space_to_depth_hw(x)
    w3 = _mk(rng, (1, 3, 3, ci, ci)) * 0.2
    wpk = pack_conv_weights(w3)

    want = conv_packed(xa, wpk, None, hw_pad="pad11")
    hp, true_wp = want.shape[2], want.shape[3]
    want = want * offset_rim_mask(hp, true_wp, ci, want.dtype)

    got = pconv_pad11(xa.reshape(n * d, *xa.shape[2:]), wpk[0], None,
                      interpret=True)
    # mask built at the TRUE width then right-padded with zeros acts as
    # the wp8-width mask (pad columns are already zero)
    m = offset_rim_mask(hp, true_wp, ci, got.dtype)
    m = jnp.pad(m, ((0, 0), (0, got.shape[2] - true_wp), (0, 0)))
    got = (got * m).reshape(n, d, hp, -1, 4 * ci)
    np.testing.assert_allclose(np.asarray(got[:, :, :, :true_wp]),
                               np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pconv_pad11_cat_matches_concat_conv(rng):
    """Fused concat+pad11 equals conv_packed on the channel-concatenated
    tensor with in_splits weights — the decoder-skip production site
    (models/segnet_packed.py dec_stage, conv_0 on [upsample, skip])."""
    n, d, h, w, ca_u, cb_u, co = 2, 2, 16, 32, 32, 32, 32
    up = _mk(rng, (n, d, h, w, ca_u))
    sk = _mk(rng, (n, d, h, w, cb_u))
    up_p = space_to_depth_hw(up)              # (n, d, h/2, w/2, 128)
    sk_p = space_to_depth_hw(sk)
    w3 = _mk(rng, (1, 3, 3, ca_u + cb_u, co)) * 0.2
    b = _mk(rng, (co,)) * 0.1
    wpk = pack_conv_weights(w3, in_splits=[ca_u, cb_u])

    cat = jnp.concatenate([up_p, sk_p], axis=-1)
    want = conv_packed(cat, wpk, pack_bias(b), hw_pad="pad11")

    from rehrseg_tpu.ops.pallas_pconv import pconv_pad11_cat
    got = pconv_pad11_cat(
        up_p.reshape(n * d, *up_p.shape[2:]),
        sk_p.reshape(n * d, *sk_p.shape[2:]),
        wpk[0], pack_bias(b), interpret=True)
    assert got is not None
    true_wp = want.shape[3]
    assert got.shape[2] == -(-true_wp // 8) * 8
    got = got.reshape(n, d, got.shape[1], got.shape[2], -1)
    np.testing.assert_allclose(np.asarray(got[:, :, :, :true_wp]),
                               np.asarray(want), rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got[:, :, :, true_wp:]) == 0.0)


def test_pconv_pad11_cat_bf16_and_uncovered(rng):
    """bf16 path, plus the fallback contract: mismatched shapes or
    non-128-multiple channels return None (caller concatenates)."""
    from rehrseg_tpu.ops.pallas_pconv import pconv_pad11_cat

    n, d, h, w, ci, co = 1, 2, 8, 16, 32, 32
    up = _mk(rng, (n, d, h, w, ci), jnp.bfloat16)
    sk = _mk(rng, (n, d, h, w, ci), jnp.bfloat16)
    up_p = space_to_depth_hw(up).reshape(n * d, h // 2, w // 2, -1)
    sk_p = space_to_depth_hw(sk).reshape(n * d, h // 2, w // 2, -1)
    w3 = _mk(rng, (1, 3, 3, 2 * ci, co), jnp.bfloat16) * 0.2
    wpk = pack_conv_weights(w3, in_splits=[ci, ci])

    want = conv_packed(
        jnp.concatenate([up_p, sk_p], -1).reshape(n, d, h // 2, w // 2, -1),
        wpk, None, hw_pad="pad11")
    got = pconv_pad11_cat(up_p, sk_p, wpk[0], None, interpret=True)
    assert got is not None and got.dtype == jnp.bfloat16
    true_wp = want.shape[3]
    got = got.reshape(n, d, got.shape[1], got.shape[2], -1)
    np.testing.assert_allclose(
        np.asarray(got[:, :, :, :true_wp], np.float32),
        np.asarray(want, np.float32), rtol=0.04, atol=0.04)

    # uncovered: spatial mismatch between the two inputs
    assert pconv_pad11_cat(up_p, sk_p[:, :-1], wpk[0], None,
                           interpret=True) is None
    # uncovered: packed channels not a multiple of 128
    assert pconv_pad11_cat(up_p[..., :64], sk_p, wpk[0][:, :, :192],
                           None, interpret=True) is None


def test_pconv3_valid_matches_conv_packed(rng):
    """kd=3 (3,2,2) VALID with z-SAME: equals the XLA 5D packed conv on
    the true wp columns; exercises z edges (zero taps), the rotating
    4-slot slab buffer, and Co tiling."""
    from rehrseg_tpu.ops.pallas_pconv import pconv3_valid

    n, d, h, w, ci, co = 2, 5, 16, 32, 32, 32
    x = _mk(rng, (n, d, h, w, ci))
    xo = offset_pack_hw(x)                    # (n, d, h/2+1, w/2+1, 4ci)
    true_wp = xo.shape[3]
    wp8 = -(-true_wp // 8) * 8
    xo8 = jnp.pad(xo, ((0, 0), (0, 0), (0, 0), (0, wp8 - true_wp),
                       (0, 0)))
    w3 = _mk(rng, (3, 3, 3, ci, co)) * 0.2
    b = _mk(rng, (co,)) * 0.1
    wpk = pack_conv_weights(w3)               # (3, 2, 2, 4ci, 4co)

    want = conv_packed(xo, wpk, pack_bias(b))
    got = pconv3_valid(xo8, wpk, pack_bias(b), w_out=true_wp - 1,
                       interpret=True)
    assert got is not None
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pconv3_valid_single_z(rng):
    """D=1: both z-edge taps gate to zero in the same iteration."""
    from rehrseg_tpu.ops.pallas_pconv import pconv3_valid

    n, d, h, w, ci = 1, 1, 8, 32, 32
    x = _mk(rng, (n, d, h, w, ci))
    xo = offset_pack_hw(x)
    true_wp = xo.shape[3]
    wp8 = -(-true_wp // 8) * 8
    xo8 = jnp.pad(xo, ((0, 0), (0, 0), (0, 0), (0, wp8 - true_wp),
                       (0, 0)))
    w3 = _mk(rng, (3, 3, 3, ci, ci)) * 0.2
    wpk = pack_conv_weights(w3)
    want = conv_packed(xo, wpk, None)
    got = pconv3_valid(xo8, wpk, None, w_out=true_wp - 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
