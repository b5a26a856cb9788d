"""Tests for pad/crop and the slice-count math (reference parity:
utils/pad.py, utils/patch_ops.py)."""

import numpy as np
import pytest

from rehrseg_tpu.utils import (
    target_pad, crop, get_pads,
    projected_size, ideal_size, calc_slices_to_crop, find_integer_p,
    get_patch, get_random_centers,
)


def test_get_pads_splits_low_floor():
    assert get_pads(10, 7) == (1, 2)
    assert get_pads(10, 10) == (0, 0)
    assert get_pads(5, 9) == (0, 0)  # never shrinks


def test_target_pad_and_crop_roundtrip(rng):
    x = rng.normal(size=(5, 7, 3)).astype(np.float32)
    padded, pads = target_pad(x, (9, 7, 8), mode="constant")
    assert padded.shape == (9, 7, 8)
    assert np.array_equal(crop(padded, pads), x)


def test_target_pad_reflect_mode(rng):
    x = rng.normal(size=(4, 4)).astype(np.float32)
    padded, pads = target_pad(x, (8, 4), mode="reflect")
    assert padded.shape == (8, 4)
    # reflect: row just above the original block mirrors row 1
    lo = pads[0][0]
    assert np.allclose(padded[lo - 1], x[1])


@pytest.mark.parametrize("scale", [2.0, 4.0, 3.0, 2.5, 4.0 / 3.0])
@pytest.mark.parametrize("n", [7, 16, 20, 33, 57])
def test_find_integer_p_property(n, scale):
    """The defining property: padding by p then projecting hits the ideal size."""
    p = find_integer_p(n, scale)
    assert projected_size(n, p, scale) == ideal_size(n, scale)


def test_calc_slices_to_crop():
    assert calc_slices_to_crop(3, 4.0) == 12
    assert calc_slices_to_crop(0, 2.5) == 0


def test_get_patch_thin_axis(rng):
    img = rng.normal(size=(20, 20, 9))
    patch = get_patch(img, (10, 10, 4), (6, 6, 1))
    assert patch.shape == (6, 6)
    assert np.array_equal(patch, img[7:13, 7:13, 4])


def test_get_random_centers_uniform(rng):
    imgs = [rng.normal(size=(16, 16, 8)) for _ in range(2)]
    centers = get_random_centers(imgs, (4, 4, 1), 50, weighted=False, rng=rng)
    assert len(centers) == 50
    for rot_idx, c in centers:
        assert rot_idx in (0, 1)
        assert len(c) == 3


def test_get_random_centers_weighted_avoids_edges(rng):
    img = np.zeros((32, 32, 8))
    img[10:20, 10:20, :] = 1.0
    centers = get_random_centers([img], (8, 8, 1), 40, weighted=True, rng=rng)
    for _, (cx, cy, cz) in centers:
        assert 5 <= cx <= 26 and 5 <= cy <= 26


def test_bounded_cache_lru():
    from rehrseg_tpu.utils.cache import BoundedCache
    c = BoundedCache(maxsize=2)
    c["a"] = 1
    c["b"] = 2
    assert "a" in c          # refreshes a's recency
    c["c"] = 3               # evicts b (least recently used)
    assert "b" not in c and "a" in c and "c" in c
    assert len(c) == 2
    assert c["a"] == 1
