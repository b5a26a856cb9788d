"""Space-to-depth (2x2 in-plane) packing for the sliding-window eval path.

WHY: TPU vector lanes are 128-wide on the channel axis. The nnUNet-style
SegModel spends most of its FLOPs in C=32/64 convs at high resolution
(encoder stage 0/1 + the last two decoder stages); XLA's conv emitter runs
those at 3-22 TFLOP/s on this chip while the same math packed to C>=128
runs at 65-88 TFLOP/s (measured, experiments/conv_micro*.py), and C=32
activations waste 4x HBM on lane padding (the round-1 OOM at TTA batch 16).

HOW (exact math, not an approximation): pack 2x2 in-plane pixel blocks into
channels (C -> 4C at half resolution, channel order (dy, dx, c)). Then:

  - a SAME (1,3,3)/(3,3,3) stride-1 conv == a VALID (1,2,2)/(3,2,2) conv on
    the OFFSET-packed input (cells shifted by one pixel up-left so the 3x3
    receptive field of each output 2x2 block covers exactly 2x2 input
    cells), with weights W'[s,t,(dy',dx',ci),(dy,dx,co)] = W[u+1,v+1,ci,co]
    where u = 2s-1+dy'-dy, v = 2t-1+dx'-dx, zero outside |u|,|v| <= 1;
  - a stride-(.,2,2) conv == the same VALID packed conv with an UNPACKED
    output channel block (only dy=dx=0 outputs exist);
  - a stride-(1,2,2) transposed conv (kernel == stride, the nnUNet decoder
    shape) == a POINTWISE conv straight into packed layout:
    W1[ci,(dy,dx,co)] = Wt[dy,dx,ci,co]; the (2,2,2) variant additionally
    interleaves D;
  - InstanceNorm statistics aggregate exactly: each original channel's
    spatial mean/var is the average of its four (dy,dx) group moments.

All functions are jnp-traceable so weight repacking happens inside the same
jit as the forward (XLA folds the rearrangement into the weight constant
when params are donated/closed-over).

Eq-FLOP inflation: a packed 3x3->2x2 conv does 16/9 the MACs of the
original. On this chip that trades at worst ~1.8x FLOPs for ~4-20x rate.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------ layout ops

def space_to_depth_hw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C), channel order (dy, dx, c)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    nd = x.ndim
    # (..., h2, dy, w2, dx, c) -> (..., h2, w2, dy, dx, c)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, h // 2, w // 2, 4 * c)


def depth_to_space_hw(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_hw`."""
    *lead, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*lead, h2, w2, 2, 2, c)
    nd = x.ndim
    # (..., h2, w2, dy, dx, c) -> (..., h2, dy, w2, dx, c)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, 2 * h2, 2 * w2, c)


def depth_to_space_cell(x: jnp.ndarray, cell: int) -> jnp.ndarray:
    """(..., h, w, cell^2*C) -> (..., h*cell, w*cell, C), channel order
    (ey, ex, c) — the general-cell inverse of :func:`space_to_depth_hw`."""
    *lead, h2, w2, cc = x.shape
    c = cc // (cell * cell)
    x = x.reshape(*lead, h2, w2, cell, cell, c)
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return x.transpose(perm).reshape(*lead, cell * h2, cell * w2, c)


def offset_pack_hw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2+1, W/2+1, 4C): packed cells shifted one
    pixel up-left (cell i covers rows 2i-1, 2i), zero-padded at the rim —
    the input layout every VALID packed conv below consumes."""
    nd = x.ndim
    pads = [(0, 0)] * (nd - 3) + [(1, 1), (1, 1), (0, 0)]
    return space_to_depth_hw(jnp.pad(x, pads))


def offset_to_unpacked_hw(xp: jnp.ndarray) -> jnp.ndarray:
    """Offset-packed (..., h+1, w+1, 4C) -> unpacked (..., 2h, 2w, C):
    depth_to_space then strip the one-pixel rim the offset grid carries."""
    y = depth_to_space_hw(xp)
    return y[..., 1:-1, 1:-1, :]


def aligned_to_offset_hw(xp: jnp.ndarray) -> jnp.ndarray:
    """Aligned-packed (..., h, w, 4C) -> offset-packed (..., h+1, w+1, 4C).

    Pure packed-space shuffle (no unpack round-trip): offset group (dy',dx')
    at cell (i,j) is pixel (2i-1+dy', 2j-1+dx'), i.e. aligned group
    (1-dy', 1-dx') shifted by (1-dy', 1-dx') cells. One fused pad+concat
    pass instead of three full-tensor relayouts."""
    *lead, h, w, c4 = xp.shape
    c = c4 // 4
    nlead = len(lead)

    def grp(k):
        return xp[..., k * c:(k + 1) * c]

    def sh(x, di, dj):
        pads = [(0, 0)] * nlead + [(di, 1 - di), (dj, 1 - dj), (0, 0)]
        return jnp.pad(x, pads)

    # offset group order (0,0),(0,1),(1,0),(1,1) <- aligned groups 3,2,1,0
    return jnp.concatenate([sh(grp(3), 1, 1), sh(grp(2), 1, 0),
                            sh(grp(1), 0, 1), sh(grp(0), 0, 0)], axis=-1)


# ------------------------------------------------------------ weight packs

def pack_conv_weights(w: jnp.ndarray, in_splits=None,
                      packed_out: bool = True,
                      aligned_in_strided: bool = False) -> jnp.ndarray:
    """(kd, 3, 3, Ci, Co) -> (kd, 2, 2, 4Ci, 4Co if packed_out else Co).

    in_splits: channel sizes of concatenated packed inputs ([Ca, Cb] for a
    decoder concat) — the packed input layout is then
    [pack(Ca) || pack(Cb)], matching jnp.concatenate of packed tensors.
    packed_out=False builds the strided-conv variant (output dy=dx=0 only);
    aligned_in_strided selects the tap map for an ALIGNED-parity input
    (u = 2s - 2 + dy' instead of 2s - 1 + dy').

    The SAME packed_out weights serve both offset->aligned (VALID conv) and
    aligned->offset (pad (1,1) conv): the tap map u = 2s - 1 + dy' - dy is
    identical for both parity transitions — which is what lets the forward
    alternate layouts with zero repacking between consecutive convs.

    Built from pads + reshapes only (a handful of XLA ops — this runs
    inside the jitted forward on traced params, so it must not unroll into
    hundreds of scatters): for output group (dy, dx), zero-pad the 3x3
    kernel to 4x4 with offsets (dy, dx); index k = 2s + dy' then reads
    W[k - dy] = W[u + 1].
    """
    kd, kh, kw, ci, co = w.shape
    assert kh == kw and kh in (3, 5), (kh, kw)
    in_splits = list(in_splits) if in_splits is not None else [ci]
    assert sum(in_splits) == ci
    if packed_out:
        out_groups = ((0, 0), (0, 1), (1, 0), (1, 1))
    elif aligned_in_strided:
        assert kh == 3
        out_groups = ((1, 1),)   # u = 2s - 2 + dy'  ==  the (dy=1) pad map
    else:
        assert kh == 3
        out_groups = ((0, 0),)

    # cell-kernel size S and base pad for T[k] = W[k - base - dy],
    # k = 2s + dy': K=3 -> S=2, base 0 (VALID conv); K=5 -> S=4, base 1
    # (conv pad (1,1) over offset cells)
    S = 2 if kh == 3 else 4
    base = (2 * S - kh - 1) // 2

    row_blocks = []
    ci_off = 0
    for cs in in_splits:
        wblk = w[:, :, :, ci_off:ci_off + cs]        # (kd, K, K, cs, co)
        cols = []
        for dy, dx in out_groups:
            t = jnp.pad(wblk, ((0, 0),
                               (base + dy, 2 * S - kh - base - dy),
                               (base + dx, 2 * S - kh - base - dx),
                               (0, 0), (0, 0)))       # (kd, 2S, 2S, cs, co)
            t = t.reshape(kd, S, 2, S, 2, cs, co)     # (kd,s,dy',t,dx',cs,co)
            t = t.transpose(0, 1, 3, 2, 4, 5, 6)      # (kd,s,t,dy',dx',cs,co)
            cols.append(t.reshape(kd, S, S, 4 * cs, co))
        row_blocks.append(jnp.concatenate(cols, axis=-1)
                          if len(cols) > 1 else cols[0])
        ci_off += cs
    return (jnp.concatenate(row_blocks, axis=3)
            if len(row_blocks) > 1 else row_blocks[0])


def pack_conv_weights_cell4(w: jnp.ndarray) -> jnp.ndarray:
    """(kd, 5, 5, Ci, Co) -> (kd, 5, 5, 4Ci, 16Co): weights for the
    stride-(2,2) packed conv that consumes OFFSET (2,2)-packed input and
    emits ALIGNED (4,4)-cell output in one pass (conv_packed_s2_cell4).

    WHY: a SAME 5x5 conv with tiny Cout (the sr_head's 16->num_classes
    logits conv, reference seg_model.py:196-210) emits 4*Cout=8 packed
    lanes — the MXU pads the output dim to 128 lanes and runs at ~4.8
    TFLOP/s while the identical conv with >=64 output lanes runs at ~64
    (measured, experiments/conv2_lanes.py). Emitting the 4x4-pixel output
    block of each packed step as 16 cells gives 16*Cout=32 lanes and folds
    the final depth_to_space into the conv's own output layout.

    Tap map: output group (ey, ex), ey,ex in 0..3, of stride-2 output pixel
    I is HR pixel 4I+ey; packed input tap s in 0..4 (pad 1) holds HR rows
    2(2I-1+s)-1+dy, so kernel index k = 2s-1+dy-ey, zero outside 0..4.
    Raw MACs: 25 taps vs the (4,4)-kernel stride-1 form's 16 per 4x the
    output pixels — 25/16 more raw FLOPs for a ~13x faster conv (measured,
    docs/BENCHMARKS.md round-4 dual-head section)."""
    kd, kh, kw, ci, co = w.shape
    assert kh == 5 and kw == 5, (kh, kw)
    S, base = 5, 1
    cols = []
    for ey in range(4):
        for ex in range(4):
            t = jnp.pad(w, ((0, 0),
                            (base + ey, 2 * S - kh - base - ey),
                            (base + ex, 2 * S - kh - base - ex),
                            (0, 0), (0, 0)))      # (kd, 2S, 2S, ci, co)
            t = t.reshape(kd, S, 2, S, 2, ci, co)
            t = t.transpose(0, 1, 3, 2, 4, 5, 6)  # (kd,s,t,dy,dx,ci,co)
            cols.append(t.reshape(kd, S, S, 4 * ci, co))
    return jnp.concatenate(cols, axis=-1)


def pack_bias_cell4(b: jnp.ndarray) -> jnp.ndarray:
    """(C,) -> (16C,) tiled over the sixteen (ey, ex) output groups."""
    return jnp.tile(b, 16)


def pack_conv_weights_cell4z2(w: jnp.ndarray) -> jnp.ndarray:
    """(5, 5, 5, Ci, Co) -> (6, 5, 5, 4Ci, 32Co): the cell4 kernel with a
    z-PAIR folded into the output too — stride (2,2,2), output group
    (ez, ey, ex), ez in {0,1}: HR voxel (2d'+ez, 4I+ey, 4J+ex). 32*Co=64
    output lanes for the 2-class head = the full measured-fast MXU regime
    (experiments/conv2_lanes.py: 64 lanes run 63.7 TF/s vs 8 lanes 4.8).
    z tap map: k_z = s6 - ez, zero outside 0..4 (s6 in 0..5); hw maps as
    pack_conv_weights_cell4. Raw MACs: 6*25/(2*16) per HR voxel = 4.8x
    parity (vs cell4's 4.0x) — lanes beat FLOPs here. Requires HR depth
    even (any even upscale gives it)."""
    kd, kh, kw, ci, co = w.shape
    assert kd == 5 and kh == 5 and kw == 5, (kd, kh, kw)
    S, base = 5, 1
    cols = []
    for ez in range(2):
        wz = jnp.pad(w, ((ez, 1 - ez), (0, 0), (0, 0), (0, 0), (0, 0)))
        for ey in range(4):
            for ex in range(4):
                t = jnp.pad(wz, ((0, 0),
                                 (base + ey, 2 * S - kh - base - ey),
                                 (base + ex, 2 * S - kh - base - ex),
                                 (0, 0), (0, 0)))  # (6, 2S, 2S, ci, co)
                t = t.reshape(6, S, 2, S, 2, ci, co)
                t = t.transpose(0, 1, 3, 2, 4, 5, 6)
                cols.append(t.reshape(6, S, S, 4 * ci, co))
    return jnp.concatenate(cols, axis=-1)


def pack_bias_cell4z2(b: jnp.ndarray) -> jnp.ndarray:
    """(C,) -> (32C,) tiled over the thirty-two (ez, ey, ex) output groups
    (group-major, class-minor — the conv_packed_s2_cell4z2 layout)."""
    return jnp.tile(b, 32)


def conv_packed_s2_cell4z2(xp: jnp.ndarray, wp: jnp.ndarray, b) -> jnp.ndarray:
    """OFFSET (2,2)-packed (B, D, H/2+1, W/2+1, 4Ci) -> z-paired ALIGNED
    (4,4)-cell (B, D/2, H/4, W/4, 32Co) via the pack_conv_weights_cell4z2
    kernel: one stride-(2,2,2) conv == SAME 5^3 stride-1 conv + (4,4)
    space-to-depth + z-pairing. D must be even; true H, W % 4 == 0."""
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(2, 2, 2),
        padding=((2, 3), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xp.dtype)
    if b is not None:
        y = y + b
    return y


def fused_upsample_conv1(feats: jnp.ndarray, w1: jnp.ndarray, b1,
                         upscale: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """[linear z-upsample by `upscale`] then [SAME 3^3 packed conv,
    aligned -> offset] reordered as [one 2D packed conv at LR depth] then
    [one composite z-matmul] — exact: both ops are linear and the conv's
    spatial part commutes with the z part.

    WHY: the straight order materializes the upscale*D-depth 128-lane
    feature tensor (4 GB at bench head geometry) and runs conv1's spatial
    MACs at HR depth; measured 75.3 ms (40.6 up + 34.7 conv,
    experiments/dual_pieces.py). The swapped order runs the spatial conv
    at LR depth (1/upscale the MACs) and the z-mix writes the 64-lane h1
    directly.

    feats: (B, D, hp, wp, 4Ci) ALIGNED; w1: (3, 3, 3, Ci, Co) unpacked
    conv weights; b1: (Co,) or None. Returns OFFSET-parity
    (B, D*upscale, hp+1, wp+1, 4Co) — the caller applies
    relu/offset_rim_mask exactly as for conv_packed(..., "pad11")."""
    from .bspline import trilinear_upsample_matrix
    kd = w1.shape[0]
    assert kd == 3, kd
    d = feats.shape[1]
    z = d * upscale
    wp1 = pack_conv_weights(w1)              # (3, 2, 2, 4Ci, 4Co)
    co4 = wp1.shape[-1]
    # fold the z-taps into output channels, order (k, co4)
    wk = wp1.transpose(1, 2, 3, 0, 4).reshape(
        1, 2, 2, wp1.shape[3], kd * co4)
    y = conv_packed(feats, wk, None, hw_pad="pad11")
    # composite z matrix: h1[z'] = sum_k W1[k] . up[z'+k-1], up = U feats
    u = np.pad(trilinear_upsample_matrix(d, upscale, align_corners),
               ((1, 1), (0, 0)))
    bz = jnp.asarray(np.stack([u[k:k + z] for k in range(kd)], axis=-1),
                     feats.dtype)             # (Z, D, kd)
    ysh = y.shape
    y = y.reshape(*ysh[:-1], kd, co4)
    h1 = jnp.einsum("bdhwkc,zdk->bzhwc", y, bz,
                    preferred_element_type=y.dtype)
    if b1 is not None:
        h1 = h1 + pack_bias(b1)
    return h1


def unpack_cell4z2(out: jnp.ndarray, ncl: int):
    """Split a conv_packed_s2_cell4z2 output into per-class HR volumes:
    (B, D/2, h4, w4, 32*ncl) -> list of ncl (B, D, H, W) arrays. Channel
    order is (ez, ey, ex, c); the ez cell moves next to D (one small
    transpose), then depth_to_space_cell handles (ey, ex)."""
    bsz, d2, h4, w4, _ = out.shape
    planes = []
    for c in range(ncl):
        pc = out[..., c::ncl]                       # (B,D2,h4,w4,32)
        pc = pc.reshape(bsz, d2, h4, w4, 2, 16)
        pc = pc.transpose(0, 1, 4, 2, 3, 5)         # (B,D2,2,h4,w4,16)
        pc = pc.reshape(bsz, 2 * d2, h4, w4, 16)
        planes.append(depth_to_space_cell(pc, 4)[..., 0])
    return planes


def conv_packed_s2_cell4(xp: jnp.ndarray, wp: jnp.ndarray, b) -> jnp.ndarray:
    """OFFSET (2,2)-packed (B, D, H/2+1, W/2+1, 4Ci) -> ALIGNED (4,4)-cell
    (B, D, H/4, W/4, 16Co) via the pack_conv_weights_cell4 kernel: one
    stride-(2,2) conv, padding (1,1), equal to a SAME 5x5 stride-1 conv on
    the unpacked tensor followed by (4,4) space-to-depth. Requires the true
    H and W divisible by 4 (callers gate; production patches are).
    kd==1 folds D into the batch; kd>1 is a 5D conv, SAME along D."""
    kd = wp.shape[0]
    hw = ((1, 1), (1, 1))
    if kd == 1:
        bsz, d, hp, wp_, c = xp.shape
        y = jax.lax.conv_general_dilated(
            xp.reshape(bsz * d, hp, wp_, c), wp[0],
            window_strides=(2, 2), padding=hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)
        y = y.reshape(bsz, d, *y.shape[1:])
    else:
        y = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(1, 2, 2),
            padding=((kd // 2, kd // 2),) + hw,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=xp.dtype)
    if b is not None:
        y = y + b
    return y


def pack_conv_weights_from_unpacked(w: jnp.ndarray) -> jnp.ndarray:
    """(kd, 3, 3, Ci, Co) -> (kd, 4, 4, Ci, 4Co): weights for a conv that
    consumes an UNPACKED tensor and emits a PACKED one in a single pass —
    the layout change rides the conv's own im2col instead of a standalone
    (bandwidth-bound, 24-38 ms) repack pass.

    A stride-1 SAME 3x3 conv with packed 2x2 output == a (4,4) stride-(2,2)
    conv: output cell (i,j) group (dy,dx) is output pixel (2i+dy, 2j+dx),
    whose taps span input rows 2i-1..2i+2 — a 4-row window. Tap map:
    W4[r] = W[r - dy] (zero outside 0..2). The SAME weights serve aligned
    output (conv pad (1,1)) and offset output (pad (2,1))."""
    kd, kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    cols = [jnp.pad(w, ((0, 0), (dy, 1 - dy), (dx, 1 - dx), (0, 0), (0, 0)))
            for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))]
    return jnp.concatenate(cols, axis=-1)


def conv_packing(x: jnp.ndarray, w4: jnp.ndarray, b, *,
                 offset_out: bool = False,
                 out_w: int | None = None) -> jnp.ndarray:
    """Unpacked (B, D, H, W, Ci) -> packed (B, D, H/2[+1], W/2[+1], 4Co)
    via the (kd, 4, 4) stride-(2,2) kernel from
    pack_conv_weights_from_unpacked. kd==1 folds D into the batch.

    out_w (offset_out only): emit the offset tensor with extra zero-input
    columns so its width is out_w cells (the 8-aligned pallas_pconv
    layout) — the pad columns hold the bias and MUST be zeroed by the
    caller's offset_rim_mask(true_w=W/2+1)."""
    kd = w4.shape[0]
    # offset output has H/2+1 cells (rows -1..H): window of cell 0 starts at
    # pixel -2 and of cell H/2 ends at pixel H+1 -> pad (2, 2)
    hw = ((2, 2), (2, 2)) if offset_out else ((1, 1), (1, 1))
    if offset_out and out_w is not None:
        extra = out_w - (x.shape[3] // 2 + 1)
        assert extra >= 0, (out_w, x.shape)
        hw = (hw[0], (2, 2 + 2 * extra))
    if kd == 1:
        bsz, d, h, w_, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(bsz * d, h, w_, c), w4[0], window_strides=(2, 2),
            padding=hw, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = y.reshape(bsz, d, *y.shape[1:])
    else:
        y = jax.lax.conv_general_dilated(
            x, w4, window_strides=(1, 2, 2),
            padding=((kd // 2, kd // 2),) + hw,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def pack_pointwise_weights(w: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv weights (Ci, Co) -> packed pointwise (4Ci, 4Co): the same
    per-pixel matmul applied within each (dy, dx) group (block-diagonal)."""
    return jnp.kron(jnp.eye(4, dtype=w.dtype), w)


def offset_rim_mask(hp: int, wp: int, c: int, dtype,
                    true_w: int | None = None) -> jnp.ndarray:
    """(hp, wp, 4c) 0/1 mask zeroing an offset-packed tensor's rim slots
    (the pixel positions outside the image that the offset grid carries).
    Convs that EMIT offset parity write garbage there (they evaluate the
    kernel one pixel beyond the image); downstream VALID convs require
    exact zeros. Multiply after the conv and again after the activation.

    true_w: when the tensor is stored WIDER than its true offset width
    (the Pallas-conv 8-aligned layout, ops/pallas_pconv.py), pass the
    true width — columns >= true_w zero entirely and the right-rim
    dx-mask applies at true_w - 1 instead of wp - 1.

    Built from iotas, NOT a literal: a dense (hp, wp, 4c) constant embeds
    multi-MB blobs into the program (a 21 MB MLIR at bench geometry that
    crashed the remote compile helper); the computed form is a few ops and
    CSEs across call sites."""
    tw = wp if true_w is None else true_w
    ih = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 4), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 4), 1)
    g = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 4), 2)
    dy, dx = g // 2, g % 2
    ok = (((ih > 0) | (dy == 1)) & ((ih < hp - 1) | (dy == 0))
          & ((iw > 0) | (dx == 1)) & ((iw < tw - 1) | (dx == 0))
          & (iw < tw))
    return jnp.repeat(ok.astype(dtype), c, axis=-1)


def pack_transpconv_weights(wt: jnp.ndarray) -> jnp.ndarray:
    """Stride==kernel (kd,2,2) transposed-conv weights -> pointwise packed
    weights (kd, Ci, 4Co): each input pixel's 2x2 output block is one packed
    cell, so upsampling is a 1x1 conv in packed space.

    Input layout (kd, 2, 2, Co, Ci): flax ConvTranspose(transpose_kernel=
    True) stores (spatial..., out, in) with DIRECT (unflipped) spatial
    indexing for the kernel==stride case (probed empirically; see
    tests/test_packed_segmodel.py)."""
    kd, two_a, two_b, co, ci = wt.shape
    assert two_a == 2 and two_b == 2
    # (kd, dy, dx, co, ci) -> (kd, ci, dy, dx, co) -> (kd, ci, 4co)
    return wt.transpose(0, 4, 1, 2, 3).reshape(kd, ci, 4 * co)


# ------------------------------------------------------------ packed ops

_HW_PADS = {
    "valid": ((0, 0), (0, 0)),   # offset in  -> aligned / strided out
    "pad11": ((1, 1), (1, 1)),   # aligned in -> offset out
    "pad10": ((1, 0), (1, 0)),   # aligned in -> strided (unpacked) out
}


def conv_packed(xp: jnp.ndarray, wp: jnp.ndarray, b, *,
                d_stride: int = 1, hw_pad: str = "valid",
                out_w: int | None = None,
                in_w: int | None = None) -> jnp.ndarray:
    """Packed 2x2-cell conv. xp: (B, D, h', w', 4Ci) packed (offset parity
    for 'valid', aligned parity for 'pad11'/'pad10');
    wp: (kd, 2, 2, 4Ci, Cout'). kd==1 folds D into the batch (2D conv, the
    fast emitter path); kd==3 stays a 5D conv with SAME padding along D.
    Bias b is in the OUTPUT layout (packed or not) or None.

    out_w ('pad11' only): widen the right pad so the offset output has
    out_w columns (8-aligned pallas_pconv layout); the zero-input pad
    columns hold the bias and MUST be zeroed by the caller's
    offset_rim_mask(true_w=w'+1).

    in_w ('valid' only): the TRUE width of an offset input stored WIDER
    (the 8-aligned pallas layout) — consumed via NEGATIVE right padding
    inside the conv, which reads only the true columns. Measured +0.23 ms
    vs an exact-width input at bench geometry where a strip-copy costs
    ~1.4 ms (experiments/pconv_cat_probe.py site B)."""
    kd = wp.shape[0]
    hw = _HW_PADS[hw_pad]
    if hw_pad == "pad11" and out_w is not None:
        extra = out_w - (xp.shape[3] + 1)
        assert extra >= 0, (out_w, xp.shape)
        hw = (hw[0], (1, 1 + extra))
    if hw_pad == "valid" and wp.shape[1] == 4:
        # 5x5 original kernel -> (4,4) cell kernel: offset-in aligned-out
        # needs one extra cell of reach on each side
        hw = ((1, 1), (1, 1))
    if hw_pad == "valid" and in_w is not None and in_w != xp.shape[3]:
        assert in_w < xp.shape[3], (in_w, xp.shape)
        hw = (hw[0], (hw[1][0], hw[1][1] + in_w - xp.shape[3]))
    if kd == 1:
        bsz, d, hp, wp_, c = xp.shape
        y = jax.lax.conv_general_dilated(
            xp.reshape(bsz * d, hp, wp_, c), wp[0],
            window_strides=(1, 1), padding=hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)
        y = y.reshape(bsz, d, *y.shape[1:])
    else:
        y = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(d_stride, 1, 1),
            padding=((kd // 2, kd // 2),) + hw,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=xp.dtype)
    if b is not None:
        y = y + b
    return y


def pointwise_packed_transpconv(x: jnp.ndarray, wp: jnp.ndarray,
                                b) -> jnp.ndarray:
    """x: (B, D, h, w, Ci) unpacked; wp: (kd, Ci, 4Co) from
    pack_transpconv_weights. kd==1: output aligned-packed (B, D, h, w, 4Co).
    kd==2: D doubles — output (B, 2D, h, w, 4Co)."""
    kd = wp.shape[0]
    if kd == 1:
        y = jnp.einsum("bdhwc,ce->bdhwe", x, wp[0],
                       preferred_element_type=x.dtype)
    else:
        y = jnp.einsum("bdhwc,kce->bdkhwe", x, wp,
                       preferred_element_type=x.dtype)
        bsz, d, k, h, w, e = y.shape
        y = y.reshape(bsz, d * k, h, w, e)
    if b is not None:
        y = y + b
    return y


def pack_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(C,) -> (4C,) tiled over the four (dy, dx) groups."""
    return jnp.tile(b, 4)


def instance_norm_packed(xp: jnp.ndarray, scale, bias,
                         epsilon: float = 1e-5,
                         offset_parity: bool = False,
                         true_w: int | None = None) -> jnp.ndarray:
    """InstanceNorm over true spatial extent on a packed tensor.

    xp: (B, D, h, w, 4C); scale/bias: (C,) affine params or None. The four
    (dy, dx) groups of one channel are the same channel, so the exact
    per-channel moments are the group-averaged moments. Only small (B, 4C)
    tensors are ever reshaped — the big activation sees nothing but
    broadcast elementwise ops and plain reductions, so no lane-layout
    churn. Statistics accumulate in fp32.

    offset_parity: the tensor is offset-packed with its rim already masked
    to zero — each group then holds (h-1)*(w-1) real pixels, so moments use
    the corrected count (var via E[x^2]-E[x]^2, one pass; the centered
    two-pass form would need a second rim mask). true_w: the true offset
    width when the tensor is stored 8-aligned-wider (pallas_pconv layout;
    pad columns are exact zeros and must not count).
    """
    b_, d, h, w, c4 = xp.shape
    c = c4 // 4

    def group_mean(t):  # (B, 4C) -> (B, 4C) group-averaged, tiled back
        return jnp.tile(jnp.mean(t.reshape(b_, 4, c), axis=1), (1, 4))

    if offset_parity:
        n = d * (h - 1) * ((true_w if true_w is not None else w) - 1)
        x32 = xp.astype(jnp.float32)
        m1 = group_mean(jnp.sum(x32, axis=(1, 2, 3)) / n)
        m2 = group_mean(jnp.sum(jnp.square(x32), axis=(1, 2, 3)) / n)
        v = m2 - jnp.square(m1)
    else:
        m1 = group_mean(jnp.mean(xp.astype(jnp.float32), axis=(1, 2, 3)))
        vg = jnp.mean(jnp.square(xp.astype(jnp.float32)
                                 - m1[:, None, None, None, :]),
                      axis=(1, 2, 3))
        v = group_mean(vg)
    k = jax.lax.rsqrt(v + epsilon)
    y = (xp - m1[:, None, None, None, :].astype(xp.dtype)) \
        * k[:, None, None, None, :].astype(xp.dtype)
    if scale is not None:
        y = y * jnp.tile(scale, 4) + jnp.tile(bias, 4)
    return y


# ------------------------------------------- deferred (fused) instance norm
#
# The fused-norm engine path (pallas_conv="fused",
# models/segnet_packed.py) never runs instance norm as standalone passes
# over the big activation: conv kernels EMIT per-image moment sums
# (ops/pallas_pconv.py `want_stats`, or `offset_stats_xla` below for
# XLA-emitted offset tensors), this glue turns them into a per-image
# scale/shift pair, and the CONSUMING conv kernel applies
# `leaky(x * sA + tA) * rim_mask` on its VMEM slab right after the DMA —
# the normalize pass's HBM read+write disappears entirely between Pallas
# producer/consumer pairs. Stats layout everywhere: (N, 16, C) fp32 with
# rows 0:8 = partial sums, 8:16 = partial sums of squares (8 sublane
# partials so kernels never cross-sublane-reduce; finalize sums them).


def norm_scale_shift_from_stats(stats: jnp.ndarray, b: int, d: int,
                                count: int, scale, bias,
                                epsilon: float, dtype) -> tuple:
    """(B*D, 16, C4) moment partials -> per-image (B*D, 8, C4) scale and
    shift in `dtype` such that `x * sA + tA` equals
    instance_norm_packed(x, scale, bias, eps) followed by nothing — i.e.
    sA = k*gamma4, tA = beta4 - m1*k*gamma4 with the same group-averaged
    fp32 moments (variance via E[x^2]-E[x]^2) as instance_norm_packed.
    The 8 identical sublane rows let a Pallas consumer read stats[n] as
    one tile-aligned (8, C4) slab."""
    c4 = stats.shape[-1]
    c = c4 // 4
    s = stats[:, 0:8].sum(axis=1).reshape(b, d, c4).sum(axis=1)
    q = stats[:, 8:16].sum(axis=1).reshape(b, d, c4).sum(axis=1)

    def group_mean(t):
        return jnp.tile(jnp.mean(t.reshape(b, 4, c), axis=1), (1, 4))

    m1 = group_mean(s / count)
    m2 = group_mean(q / count)
    k = jax.lax.rsqrt(m2 - jnp.square(m1) + epsilon)
    if scale is not None:
        g4 = jnp.tile(scale, 4).astype(jnp.float32)
        b4 = jnp.tile(bias, 4).astype(jnp.float32)
    else:
        g4 = jnp.float32(1.0)
        b4 = jnp.float32(0.0)
    sa = (k * g4).astype(dtype)
    ta = (b4 - m1 * k * g4).astype(dtype)
    rep = lambda t: jnp.broadcast_to(t[:, None, None, :],
                                     (b, d, 8, c4)).reshape(b * d, 8, c4)
    return rep(sa), rep(ta)


def offset_stats_xla(y: jnp.ndarray, true_w: int | None = None):
    """Masked moment partials of an XLA-emitted offset tensor
    y (B, D, hp, wp, C4) -> (B*D, 16, C4) fp32, matching the kernels'
    `want_stats` output (one HBM read — the same cost as the stats
    reduction instance_norm_packed would do; the win is that the APPLY
    then fuses into the consuming Pallas conv instead of its own
    read+write pass). The rim mask is fused into the reduction, so the
    producer conv's output never needs a materialized mask pass."""
    bsz, d, hp, wp, c4 = y.shape
    m = offset_rim_mask(hp, wp, c4 // 4, jnp.float32, true_w=true_w)
    y32 = y.astype(jnp.float32) * m
    s = jnp.sum(y32, axis=(2, 3))                       # (B, D, C4)
    q = jnp.sum(jnp.square(y32), axis=(2, 3))
    z = jnp.zeros((bsz * d, 7, c4), jnp.float32)
    return jnp.concatenate(
        [s.reshape(bsz * d, 1, c4), z, q.reshape(bsz * d, 1, c4), z],
        axis=1)


def aligned_stats_xla(y: jnp.ndarray):
    """Moment partials of an XLA-emitted aligned tensor
    y (B, D, h, w, C4) -> (B*D, 16, C4) fp32 (no rim on aligned parity)."""
    bsz, d, h, w, c4 = y.shape
    y32 = y.astype(jnp.float32)
    s = jnp.sum(y32, axis=(2, 3))
    q = jnp.sum(jnp.square(y32), axis=(2, 3))
    z = jnp.zeros((bsz * d, 7, c4), jnp.float32)
    return jnp.concatenate(
        [s.reshape(bsz * d, 1, c4), z, q.reshape(bsz * d, 1, c4), z],
        axis=1)


def apply_norm_act_packed(y: jnp.ndarray, sa: jnp.ndarray, ta: jnp.ndarray,
                          slope: float, offset_parity: bool = False,
                          true_w: int | None = None) -> jnp.ndarray:
    """Materialize a deferred norm: leaky(y*sA + tA) [* rim_mask] as ONE
    XLA pass — used when a deferred tensor's consumer is not a Pallas
    kernel (stage outputs, heads, strided convs). y: (B, D, hp, wp, C4);
    sa/ta: (B*D, 8, C4) from norm_scale_shift_from_stats."""
    bsz, d, hp, wp, c4 = y.shape
    sab = sa[:, 0, :].reshape(bsz, d, 1, 1, c4).astype(y.dtype)
    tab = ta[:, 0, :].reshape(bsz, d, 1, 1, c4).astype(y.dtype)
    z = y * sab + tab
    z = jnp.where(z >= 0, z, z * jnp.asarray(slope, z.dtype))
    if offset_parity:
        z = z * offset_rim_mask(hp, wp, c4 // 4, z.dtype, true_w=true_w)
    return z
