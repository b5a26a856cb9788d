"""Exactness of the fused Pallas TTA-accumulate kernel (ops/pallas_tail.py)
against the plain XLA computation, in interpret mode (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rehrseg_tpu.ops.pallas_tail import accumulate_tta_tile, zgrouped_combos


def xla_reference(logits, preds, gaussian, offsets, z_scale=1):
    """The scan-tail math: unflip each combo, mean, gauss-weight, add."""
    combos = zgrouped_combos()
    sx, sy, sz, valid = (int(v) for v in offsets)
    n, C, od, ph, pw = preds.shape
    acc = np.asarray(logits).copy()
    mean = np.zeros((C, od, ph, pw), np.float32)
    for i, combo in enumerate(combos):
        p = np.asarray(preds[i], np.float32)  # (C, od, ph, pw)
        axes = tuple(a + 1 for a in combo)    # tile axes (z,h,w) -> (1,2,3)
        mean += np.flip(p, axes) if axes else p
    mean /= n
    # the kernel rounds the gaussian to the preds dtype (bf16)
    g_r = np.asarray(jnp.asarray(gaussian).astype(jnp.bfloat16)
                     .astype(jnp.float32))
    w = mean * g_r[None] * valid
    zo = sx * z_scale
    acc[:, zo:zo + od, sy:sy + ph, sz:sz + pw] += w
    return acc


@pytest.mark.parametrize("z_scale,offsets", [
    (1, (2, 8, 128, 1)),
    (1, (0, 0, 0, 1)),
    (4, (1, 16, 0, 1)),
    (1, (2, 8, 128, 0)),   # padded grid row: contributes nothing
])
def test_accumulate_tta_tile_interpret(z_scale, offsets):
    rng = np.random.default_rng(0)
    C, pd, ph, pw = 2, 2, 16, 256
    od = pd * z_scale
    D, H, W = 8 * z_scale, 32, 512
    preds = jnp.asarray(rng.normal(size=(8, C, od, ph, pw)), jnp.bfloat16)
    g = jnp.asarray(rng.uniform(0.1, 1.0, size=(od, ph, pw)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(C, D, H, W)) * 0.1, jnp.float32)

    want = xla_reference(logits, preds, g, offsets, z_scale)
    got = accumulate_tta_tile(logits, preds, g,
                              jnp.asarray(offsets, jnp.int32),
                              z_scale=z_scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_accumulate_two_tiles_overlap():
    """Two overlapping tiles accumulate additively (the scan invariant)."""
    rng = np.random.default_rng(1)
    C, od, ph, pw = 2, 2, 16, 256
    D, H, W = 4, 32, 512
    logits = jnp.zeros((C, D, H, W), jnp.float32)
    g = jnp.asarray(rng.uniform(0.1, 1.0, size=(od, ph, pw)), jnp.float32)
    tiles = [(0, 0, 0, 1), (1, 8, 128, 1)]
    preds = [jnp.asarray(rng.normal(size=(8, C, od, ph, pw)), jnp.bfloat16)
             for _ in tiles]

    want = np.asarray(logits)
    for p, off in zip(preds, tiles):
        want = xla_reference(want, p, g, off)
    got = logits
    for p, off in zip(preds, tiles):
        got = accumulate_tta_tile(got, p, g, jnp.asarray(off, jnp.int32),
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
