"""Golden axis-routing tests for SR volume inference.

The reference's SR inference chains are dense permute/rot90/flip pipelines
(sr_utils.py:33-97 for SMORE/WDSR, 102-196 for FLAVR, 200-242 for the
uncertainty pass). A silent axis swap in our rebuild would corrupt every
downstream stage while unit tests stay green (VERDICT round 1, weak #5).

These tests reimplement the reference chains LITERALLY in numpy (same
transposes, same rot90, same quirks — the axis-2 "slice" pad that actually
pads Y, the x-flip at sr_utils.py:74) with axis-sensitive mock models
honoring each framework's tensor contract (torch NCHW / our channels-last),
and assert our inference utilities produce identical arrays at the h5/NIfTI
artifact boundary.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rehrseg_tpu.utils.patch import find_integer_p, calc_slices_to_crop
from rehrseg_tpu.infer.sr_infer import infer_wdsr_volume, infer_flavr_volume


SEP = 4.0


# ---------------------------------------------------------------- mocks
# Axis-sensitive stand-ins for WDSR / FLAVR: z-upsample (WDSR) or per-slice
# reweighting (FLAVR) plus a one-pixel roll along W so any H/W swap or flip
# between the two chains changes the output.

def _mock_wdsr_torch(x_nchw, sep=int(SEP)):
    """(N, C, H, W) -> (N, C, H*sep, W): the torch-contract mock."""
    up = np.repeat(x_nchw, sep, axis=2)
    ramp = (1.0 + np.arange(up.shape[2]) * 0.01)[None, None, :, None]
    return up * ramp + 0.5 * np.roll(up, 1, axis=3)


class _MockWDSRJax:
    """Our-contract mock: (B, H, W, C) -> (B, H*sep, W, C), same math."""

    def apply(self, params, b, sep=int(SEP)):
        up = jnp.repeat(b, sep, axis=1)
        ramp = (1.0 + jnp.arange(up.shape[1]) * 0.01)[None, :, None, None]
        return up * ramp + 0.5 * jnp.roll(up, 1, axis=2)


def _mock_flavr_torch(x_nctHW):
    """(1, C, 4, H, W) -> (1, C, 4, H, W)."""
    w = (1.0 + np.arange(4) * 0.1)[None, None, :, None, None]
    return x_nctHW * w + 0.5 * np.roll(x_nctHW, 1, axis=4)


class _MockFLAVRJax:
    """Our contract: (B, 4, H, W, C) -> (B, 4, H, W, C), same math.
    Returns a tuple (pred, uncertainty-ish) to exercise out_index routing."""

    def apply(self, params, b):
        w = (1.0 + jnp.arange(4) * 0.1)[None, :, None, None, None]
        pred = b * w + 0.5 * jnp.roll(b, 1, axis=3)
        return pred, pred * 0.25


# ------------------------------------------------- reference chains (numpy)

def _itk_write_read(arr_zyx):
    """sitk.GetImageFromArray + WriteImage then nibabel read round-trip:
    (z, y, x) array on disk comes back as (x, y, z)."""
    return arr_zyx.transpose(2, 1, 0)


def _ref_smore_chain(vol_xyzc, sep):
    """Literal numpy port of inference_smore (sr_utils.py:33-97) for
    lr_axis=0, angles=[90], followed by the nibabel read-back that
    postprocess_smore performs (sr_utils.py:244-255). Returns (X, Y, Z', C)."""
    a = vol_xyzc.transpose(2, 0, 1, 3)                  # lr_axis_to_z
    p = find_integer_p(a.shape[2], sep)                 # NOTE: pads axis 2 = Y
    n_crop = calc_slices_to_crop(p, sep)
    a = np.pad(a, ((0, 0), (0, 0), (0, p), (0, 0)), mode="reflect")
    b = np.rot90(a, 1, axes=(0, 1))                     # rotate_vol_2d(+90)
    b = b.transpose(0, 3, 2, 1)
    batch = b.transpose(0, 1, 3, 2)                     # apply_to_vol_smore
    sr = _mock_wdsr_torch(batch, int(sep))
    result = sr.transpose(0, 3, 1, 2)
    out = result                                        # rotate_vol_2d(.., 0)
    if n_crop:
        out = out[:, :, :-n_crop]                       # crops C (quirk)
    out = out.transpose(2, 0, 1, 3)                     # z_axis_to_lr_axis
    out = out.transpose(0, 3, 2, 1)[:, :, :, ::-1]      # sr_utils.py:74
    chans = [_itk_write_read(out[c]) for c in range(out.shape[0])]
    return np.stack(chans, axis=-1)


def _ref_flavr_chain(vol_xyzc, sep, out_idx):
    """Literal numpy port of inference_flavr + apply_to_vol_flavr
    (sr_utils.py:102-196; uncertainty pass 200-242 is the same routing when
    n_crop == 0 — quirk Q6's double crop/reorient is then a no-op).
    Returns (X, Y, T, C_out) after the nibabel read-back."""
    a = vol_xyzc.transpose(2, 0, 1, 3)                  # (Z, X, Y, C)
    p = find_integer_p(a.shape[2], sep)
    n_crop = calc_slices_to_crop(p, sep)
    a = np.pad(a, ((0, 0), (0, 0), (0, p), (0, 0)), mode="reflect")
    img = a.transpose(0, 3, 2, 1)                       # (Z, C, Y, X)

    # apply_to_vol_flavr: pad dims 2,3 to x16, 4-slice windows over dim 0
    z, c, y, x = img.shape
    ori_x, ori_y = img.shape[2], img.shape[3]
    pad2, pad3 = (-y) % 16, (-x) % 16
    img = np.pad(img, ((0, 0), (0, 0), (0, pad2), (0, pad3)))
    outs = []
    for st in range(z - 1):
        if st == 0:
            window = np.concatenate([np.zeros_like(img[0:1]), img[0:3]])
        elif st == z - 2:
            window = np.concatenate([img[st - 1:], np.zeros_like(img[0:1])])
        else:
            window = img[st - 1:st + 3]
        batch = window.transpose(1, 0, 3, 2)[None]       # (1, C, 4, X, Y)
        sr = _mock_flavr_torch(batch)
        if out_idx == 1:
            sr = sr * 0.25                               # mock's second output
        outs.append(sr[:, :, :, :ori_y, :ori_x])
    result = np.concatenate(outs, axis=2)[0]             # (C, T, X, Y)
    result = result.transpose(1, 0, 2, 3)                # (T, C, X, Y)
    out = result.transpose(0, 3, 1, 2)                   # (T, Y, C, X)
    if n_crop:
        out = out[:, :, :-n_crop]
    out = out.transpose(2, 0, 1, 3)                      # (C, T, Y, X)
    chans = [_itk_write_read(out[ci]) for ci in range(out.shape[0])]
    return np.stack(chans, axis=-1)


# ---------------------------------------------------------------- tests

@pytest.mark.parametrize("shape", [(5, 6, 4, 2), (7, 4, 3, 2)])
def test_wdsr_volume_routing_matches_reference(shape, rng):
    vol = rng.normal(size=shape).astype(np.float32)
    ref = _ref_smore_chain(vol, SEP)
    ours = np.asarray(infer_wdsr_volume(_MockWDSRJax(), {}, vol, SEP))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_idx", [0, 1])
def test_flavr_volume_routing_matches_reference(out_idx, rng):
    vol = rng.normal(size=(5, 6, 4, 2)).astype(np.float32)
    ref = _ref_flavr_chain(vol, SEP, out_idx)
    ours = np.asarray(
        infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP, out_index=out_idx))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_integer_separation_has_no_slice_pad():
    """The reference's axis-2 'slice' pad actually pads Y (sr_utils.py:46-48
    operates after lr_axis_to_z) and its crop hits the channel axis — both
    quirks are no-ops exactly when find_integer_p returns 0, which holds for
    integer separations. Pin that so the chains above stay comparable."""
    for n in (3, 4, 5, 6, 17, 24):
        assert find_integer_p(n, 4.0) == 0
        assert find_integer_p(n, 2.0) == 0


@pytest.mark.parametrize("out_idx", [0, 1])
def test_flavr_device_volume_parity(out_idx, rng):
    """The device-resident volume inference (one jit: gather-windowing +
    lax.map forwards + concat) must equal the host-loop oracle exactly —
    including the pad-to-batch tail (z=7 -> 6 windows, batch 4 -> pad 2)."""
    vol = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    host = np.asarray(infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP,
                                         out_index=out_idx, batch=4,
                                         device=False))
    dev = np.asarray(infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP,
                                        out_index=out_idx, batch=4,
                                        device=True))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)


def test_flavr_device_volume_bf16(rng):
    """compute_dtype=bf16 (serving/bench + extra.sr_infer_dtype): same
    routing/shapes, values near the fp32 oracle, fp32 dtype on return."""
    import jax.numpy as jnp
    vol = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    ref = np.asarray(infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP,
                                        out_index=0, batch=4))
    out = np.asarray(infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP,
                                        out_index=0, batch=4,
                                        compute_dtype=jnp.bfloat16))
    assert out.dtype == np.float32
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_flavr_volume_async_matches_sync(rng):
    """infer_flavr_volume_async's finalize() must equal the sync device
    path bit-exactly — it's the same dispatch, deferred fetch (the
    stage-1c 1-deep subject pipeline rides on this)."""
    from rehrseg_tpu.infer.sr_infer import infer_flavr_volume_async
    vol = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    sync = np.asarray(infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP,
                                         out_index=0, batch=4))
    fin_a = infer_flavr_volume_async(_MockFLAVRJax(), {}, vol, SEP,
                                     out_index=0, batch=4)
    fin_b = infer_flavr_volume_async(_MockFLAVRJax(), {}, vol, SEP,
                                     out_index=1, batch=4)  # overlap two
    np.testing.assert_array_equal(np.asarray(fin_a()), sync)
    ref_b = np.asarray(infer_flavr_volume(_MockFLAVRJax(), {}, vol, SEP,
                                          out_index=1, batch=4))
    np.testing.assert_array_equal(np.asarray(fin_b()), ref_b)
