"""Pallas (2,2) packed conv kernel: exact parity vs the XLA conv
(interpret mode on the CPU mesh; the same code compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rehrseg_tpu.ops.pallas_conv import conv2x2_valid_bias


@pytest.mark.parametrize("n,h,w", [(2, 8, 12), (1, 16, 8)])
def test_pallas_conv2x2_matches_lax(rng, n, h, w):
    c = 128
    x = jnp.asarray(rng.normal(size=(n, h + 1, w + 1, c)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(2, 2, c, c)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, wk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv2x2_valid_bias(x, wk, b, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_conv2x2_uncovered_shapes_return_none(rng):
    x = jnp.zeros((1, 8, 9, 64))      # C not a lane multiple
    wk = jnp.zeros((2, 2, 64, 64))
    assert conv2x2_valid_bias(x, wk) is None
    x = jnp.zeros((1, 4, 9, 128))     # h=3 has no block divisor
    wk = jnp.zeros((2, 2, 128, 128))
    assert conv2x2_valid_bias(x, wk) is None
