"""Space-to-depth packed SegModel forward for the sliding-window eval path.

Consumes STANDARD SegModel parameters (models.segnet) and computes the
mathematically identical forward with the high-resolution low-channel
stages in packed 2x2 layout (ops.pack2d): C=32/64/128 become 128/256/512
lanes, which is what the MXU wants, and all (1,3,3) convs fold D into the
batch and run as 2D convs.

ZERO standalone layout passes on the hot path. Measured on v5e-lite
(experiments/pack_overhead_micro.py): every repack/d2s/s2d costs 24-38 ms —
more than a packed conv — so all layout changes ride inside convs instead:

  unpacked -> packed   (4,4) stride-2 conv           [pack_conv_weights_
                                                      from_unpacked]
  offset   -> aligned  (2,2) VALID conv              [pack_conv_weights]
  aligned  -> offset   (2,2) pad(1,1) conv            (same weights!)
  aligned  -> strided  (2,2) pad(1,0) conv           [aligned_in_strided]
  upsample -> aligned  pointwise conv                [pack_transpconv_*]

Parities alternate through a stage so each encoder stage ends ALIGNED
(what both the next strided conv and the decoder concat consume). Offset-
parity tensors carry a one-pixel rim of conv spill; it is masked to zero
around each offset conv's norm/act (elementwise, fuses).

This is a pure layout transform — tests/test_packed_segmodel.py pins
exactness against SegModel.apply. Reference hot path being accelerated:
nnUNet-style PlainConvUNet eval (seg_utils.py:240-287 /
seg_model.py:153-210).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pack2d import (
    space_to_depth_hw, depth_to_space_hw, offset_to_unpacked_hw,
    pack_conv_weights, pack_conv_weights_from_unpacked,
    pack_transpconv_weights, pack_pointwise_weights, pack_bias,
    conv_packed, conv_packing, pointwise_packed_transpconv,
    instance_norm_packed, offset_rim_mask,
    pack_conv_weights_cell4, pack_bias_cell4, conv_packed_s2_cell4,
    depth_to_space_cell,
    pack_conv_weights_cell4z2, conv_packed_s2_cell4z2, unpack_cell4z2,
    pack_bias_cell4z2,
    fused_upsample_conv1,
    norm_scale_shift_from_stats, offset_stats_xla, aligned_stats_xla,
    apply_norm_act_packed,
)


def _to3(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def _instance_norm(x, scale, bias, eps):
    # STATISTICS in fp32 regardless of compute dtype (bf16 mean/var over
    # millions of voxels loses whole digits) but the big elementwise
    # normalize stays in x.dtype — materializing an fp32 copy of a
    # full-resolution activation costs 2x HBM on the eval hot path
    # (measured: 3.4 -> 2.5 Mvox/s on the bench geometry)
    spatial = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=spatial, keepdims=True)
    v = jnp.var(x32, axis=spatial, keepdims=True)
    y = (x - m.astype(x.dtype)) * lax.rsqrt(v + eps).astype(x.dtype)
    if scale is not None:
        y = y * scale + bias
    return y


def _conv_std(x, w, b, strides):
    pad = tuple((k // 2, k // 2) for k in w.shape[:3])
    y = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    return y + b if b is not None else y


def _transpconv_std(x, wt, b, strides):
    pads = tuple((k - 1, k - 1) for k in wt.shape[:3])
    y = lax.conv_transpose(
        x, wt, strides=strides, padding=pads, transpose_kernel=True,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b if b is not None else y


def _unpack(x, layout, tw=None):
    if layout == "a":
        return depth_to_space_hw(x)
    if layout == "o":
        if tw is not None and tw != x.shape[3]:
            x = x[:, :, :, :tw]      # strip pallas-layout pad columns
        return offset_to_unpacked_hw(x)
    return x


def _true_hw(x, layout, tw=None):
    if layout == "a":
        return x.shape[2] * 2, x.shape[3] * 2
    if layout == "o":
        w = x.shape[3] if tw is None else tw
        return (x.shape[2] - 1) * 2, (w - 1) * 2
    return x.shape[2], x.shape[3]


def _packable(kernel, h, w, feats, pack_max_channels):
    return (feats <= pack_max_channels and kernel[1] == 3 and kernel[2] == 3
            and h % 2 == 0 and w % 2 == 0)


def _mask_offset(y, c, tw=None):
    m = offset_rim_mask(y.shape[2], y.shape[3], c, y.dtype, true_w=tw)
    return y * m


def _round8(v):
    return -(-v // 8) * 8


class _Deferred:
    """A conv output whose instance norm is DEFERRED (pallas_conv=
    "fused"): `y` is the raw offset-parity tensor (rim zeroed when a
    Pallas kernel produced it, garbage when XLA did — consumers mask
    either way), and `leaky(y*sa + ta) * rim_mask` is the finalized
    activation. The next conv in the stage applies that transform on its
    VMEM slabs (ops/pallas_pconv.py `pre=`), so the normalize pass's
    HBM read+write never happens; `materialize()` is the one-pass XLA
    fallback for consumers that aren't fused kernels."""

    def __init__(self, y, sa, ta, slope, true_w):
        self.y = y
        self.sa = sa
        self.ta = ta
        self.slope = slope
        self.true_w = true_w

    def materialize(self):
        return apply_norm_act_packed(self.y, self.sa, self.ta, self.slope,
                                     offset_parity=True,
                                     true_w=self.true_w)


def _fused_consumable(feats, out_tw, kd):
    """Will the NEXT conv of this stage (same kernel size and feats) be a
    covered fused VALID consumer of a widened offset tensor? Gates the
    widened emission + deferral: emitting 8-aligned widths from XLA convs
    costs a little extra right-pad, so only pay it when the consumer can
    fuse (shape checks mirror pconv_valid/pconv3_valid coverage)."""
    return (feats * 4) % 128 == 0 and (out_tw - 1) % 8 == 0 and kd in (1, 3)


def _defer_offset(y, stats, scale, nbias, eps, slope, true_w):
    """Build a _Deferred from an offset conv output + moment partials."""
    bsz, d, hp = y.shape[0], y.shape[1], y.shape[2]
    count = d * (hp - 1) * ((true_w if true_w is not None
                             else y.shape[3]) - 1)
    sa, ta = norm_scale_shift_from_stats(stats, bsz, d, count, scale,
                                         nbias, eps, y.dtype)
    return _Deferred(y, sa, ta, slope, true_w)


def _conv_norm_act(x, layout, cp, kernel, stride, feats, a, *,
                   pack_max_channels, want_out="a", in_splits=None,
                   tw=None, pallas=False):
    """One ConvNormAct. x in layout 'u'/'a'/'o'; returns (y, layout', tw').

    x may also be a PAIR (xa, xb) of aligned-packed tensors standing for
    concatenate([xa, xb], -1) with in_splits giving their unpacked
    channel sizes — the decoder skip concat. When pallas covers the
    shape, the pair feeds pconv_pad11_cat and the concatenated tensor is
    never materialized (5.2% of the aligned engine's device time,
    docs/BENCHMARKS.md round-5 op profile); every other path
    concatenates here, which XLA fuses identically to a caller-side
    concat.

    want_out: preferred packed output parity for stride-1 packed convs
    ('a' or 'o') — chosen by the caller so each stage ends ALIGNED.
    tw: the TRUE offset width when layout == 'o' and the tensor is stored
    wider (the pallas 8-aligned layout); None = exact width.
    pallas: route packed convs through ops.pallas_pconv (offset tensors
    then live at 8-aligned widths). True = every covered stride-1 class
    (a measured engine-level NEGATIVE, kept for the A/B harness);
    "cat" = only the fused decoder-concat site (pconv_pad11_cat);
    "fused" = "cat" PLUS deferred instance norm: offset conv outputs
    come back as _Deferred (stats from the kernel or one XLA masked
    reduce), the consuming Pallas VALID conv applies
    rim_mask*leaky(x*sa+ta) on its VMEM slabs (no normalize pass in
    HBM), and aligned outputs finalize from kernel stats in ONE apply
    pass instead of stats-reads + apply.

    x may also be a _Deferred from a previous fused call.
    """
    from ..ops.pallas_pconv import (pconv_valid, pconv_pad11, pconv3_valid,
                                    pconv_pad11_cat)

    pallas_all = pallas is True
    pallas_fused = pallas == "fused"
    pallas_cat = bool(pallas)

    pair = isinstance(x, (tuple, list))
    if pair and (layout != "a" or len(x) != 2 or not pallas_cat):
        x = jnp.concatenate(list(x), axis=-1)
        pair = False
    deferred = isinstance(x, _Deferred)
    x0 = x.y if deferred else (x[0] if pair else x)

    w = cp["conv"]["kernel"]
    b = cp["conv"].get("bias")
    scale = cp["norm"]["scale"] if a["norm_affine"] else None
    nbias = cp["norm"]["bias"] if a["norm_affine"] else None
    eps, slope = a["norm_eps"], a["nonlin_slope"]

    h, wd = _true_hw(x0, layout, tw)
    strided = stride[1] == 2 and stride[2] == 2
    otw = tw if tw is not None else (x0.shape[3] if layout == "o" else None)

    # The packed dispatch implements exactly two stride shapes:
    # (1,1,1) and (d,2,2) with the D-stride carried by a kd>1 conv. Any
    # other legal plans.json stride (D-only (2,1,1), or a (1,k,k) kernel
    # paired with a D-stride, where conv_packed's kd==1 branch folds D
    # into the batch and cannot stride it) must take the standard path.
    packed_stride_ok = (tuple(stride) == (1, 1, 1)
                        or (strided and (kernel[0] > 1 or stride[0] == 1)))

    # a strided conv EMITS unpacked output either way, so whenever its
    # input is already packed, consume it packed regardless of the channel
    # threshold — the alternative is a standalone depth_to_space pass on
    # the skip (0.5 GB at the s2 boundary of the bench geometry)
    strided_packable = (strided and layout in ("a", "o")
                        and kernel[1] == 3 and kernel[2] == 3)

    take_packed = packed_stride_ok and (
        strided_packable or _packable(kernel, h, wd, feats,
                                      pack_max_channels))

    # a deferred input is only consumable by the fused offset->aligned
    # Pallas convs below; every other path materializes it first (one
    # XLA apply pass — exactly the normalize pass the classic mode runs)
    if deferred and not (pallas_fused and take_packed and not strided
                         and layout == "o"):
        x = x.materialize()
        x0 = x
        deferred = False

    if take_packed:
        if strided and layout != "u":
            if pair:
                x = jnp.concatenate(list(x), axis=-1)
                pair = False
            if layout == "a":
                wp = pack_conv_weights(w, in_splits=in_splits,
                                       packed_out=False,
                                       aligned_in_strided=True)
                y = conv_packed(x, wp, b, d_stride=stride[0], hw_pad="pad10")
            else:  # offset
                wp = pack_conv_weights(w, in_splits=in_splits,
                                       packed_out=False)
                # widened pallas layout: negative right pad inside the
                # conv reads only the true columns (no strip copy)
                y = conv_packed(x, wp, b, d_stride=stride[0], in_w=otw)
            return (_leaky(_instance_norm(y, scale, nbias, eps), slope),
                    "u", None)

        if not strided:
            kd = int(kernel[0])
            out_tw = None
            out_stats = None      # Pallas-emitted moment partials
            defer_out = False     # fused: return the offset raw + sa/ta
            if layout == "u":
                w4 = pack_conv_weights_from_unpacked(w)
                out = want_out
                fuse_emit = (pallas_fused and out == "o"
                             and _fused_consumable(
                                 feats, x.shape[3] // 2 + 1, kd))
                if out == "o" and (pallas_all or fuse_emit):
                    out_tw = x.shape[3] // 2 + 1
                    y = conv_packing(x, w4, pack_bias(b) if b is not None
                                     else None, offset_out=True,
                                     out_w=_round8(out_tw))
                    defer_out = fuse_emit
                else:
                    y = conv_packing(x, w4, pack_bias(b) if b is not None
                                     else None,
                                     offset_out=(want_out == "o"))
            elif layout == "a":
                wp = pack_conv_weights(w, in_splits=in_splits)
                pb = pack_bias(b) if b is not None else None
                out = "o"
                out_tw = x0.shape[3] + 1
                fuse_emit = (pallas_fused
                             and _fused_consumable(feats, out_tw, kd))
                y = None
                if pair and kd == 1:
                    bsz, d = x0.shape[0], x0.shape[1]
                    r = pconv_pad11_cat(
                        x[0].reshape(bsz * d, *x[0].shape[2:]),
                        x[1].reshape(bsz * d, *x[1].shape[2:]), wp[0], pb,
                        want_stats=fuse_emit)
                    if r is not None:
                        if fuse_emit:
                            y4, out_stats = r
                            defer_out = True
                        else:
                            y4 = r
                        y = y4.reshape(bsz, d, *y4.shape[1:])
                if y is None and pair:
                    x = jnp.concatenate(list(x), axis=-1)
                    pair = False
                if y is None and pallas_all and kd == 1:
                    bsz, d = x.shape[0], x.shape[1]
                    y4 = pconv_pad11(
                        x.reshape(bsz * d, *x.shape[2:]), wp[0], pb)
                    if y4 is not None:
                        y = y4.reshape(bsz, d, *y4.shape[1:])
                if y is None and (pallas_all or fuse_emit):
                    # kd==3 (or uncovered): XLA conv emitting the widened
                    # layout directly; pad columns hold the bias and the
                    # rim mask (downstream, or the fused consumer's
                    # in-kernel mask) zeroes them
                    y = conv_packed(x, wp, pb, hw_pad="pad11",
                                    out_w=_round8(out_tw))
                    defer_out = fuse_emit
                elif y is None:
                    y = conv_packed(x, wp, pb, hw_pad="pad11")
                    out_tw = None
            else:  # offset -> aligned
                wp = pack_conv_weights(w, in_splits=in_splits)
                pb = pack_bias(b) if b is not None else None
                out = "a"
                y = None
                if deferred and otw is not None and (otw - 1) % 8 == 0:
                    # fused consumer: normalize rides the kernel's slab
                    # loads, and the aligned output's moments come back
                    # for a one-pass finalize below
                    pre = (x.sa, x.ta, x.slope)
                    if kd == 1:
                        bsz, d = x0.shape[0], x0.shape[1]
                        r = pconv_valid(
                            x0.reshape(bsz * d, *x0.shape[2:]), wp[0], pb,
                            w_out=otw - 1, pre=pre, want_stats=True)
                        if r is not None:
                            y4, out_stats = r
                            y = y4.reshape(bsz, d, *y4.shape[1:])
                    elif kd == 3:
                        d = x0.shape[1]
                        r = pconv3_valid(
                            x0, wp, pb, w_out=otw - 1,
                            pre=(x.sa[::d], x.ta[::d], x.slope),
                            want_stats=True)
                        if r is not None:
                            y, out_stats = r
                    if y is None:      # uncovered: fall back whole
                        x = x.materialize()
                        x0 = x
                        deferred = False
                if y is None and pallas_all and otw is not None \
                        and (otw - 1) % 8 == 0:
                    if kd == 1:
                        bsz, d = x.shape[0], x.shape[1]
                        y4 = pconv_valid(
                            x.reshape(bsz * d, *x.shape[2:]), wp[0], pb,
                            w_out=otw - 1)
                        if y4 is not None:
                            y = y4.reshape(bsz, d, *y4.shape[1:])
                    else:
                        y = pconv3_valid(x, wp, pb, w_out=otw - 1)
                if y is None:
                    # widened pallas layout consumed via negative right
                    # padding inside the conv (micro A/B site B: +0.23 ms
                    # vs exact width; a strip copy costs ~1.4 ms)
                    y = conv_packed(x, wp, pb, in_w=otw)
            if out == "o":
                if defer_out:
                    if out_stats is None:
                        out_stats = offset_stats_xla(y, true_w=out_tw)
                    return (_defer_offset(y, out_stats, scale, nbias, eps,
                                          slope, out_tw), out, out_tw)
                y = _mask_offset(y, feats, tw=out_tw)
                y = instance_norm_packed(y, scale, nbias, eps,
                                         offset_parity=True,
                                         true_w=out_tw)
                y = _mask_offset(_leaky(y, slope), feats, tw=out_tw)
            elif out_stats is not None:
                # fused aligned finalize: ONE apply pass from kernel
                # moments (vs stats-reads + apply in the classic path)
                bsz, d, hh, ww = y.shape[:4]
                sa, ta = norm_scale_shift_from_stats(
                    out_stats, bsz, d, d * hh * ww, scale, nbias, eps,
                    y.dtype)
                y = apply_norm_act_packed(y, sa, ta, slope)
            else:
                y = _leaky(instance_norm_packed(y, scale, nbias, eps),
                           slope)
            return y, out, out_tw

    # ---------------- standard path
    if pair:
        x = jnp.concatenate(list(x), axis=-1)
    x = _unpack(x, layout, otw)
    y = _conv_std(x, w, b, stride)
    return (_leaky(_instance_norm(y, scale, nbias, eps), slope), "u", None)


def segmodel_apply_packed(arch: dict, params, x, *, num_classes: int = 2,
                          upscale: int = 4, pack_max_channels: int = 128,
                          dual: bool = False, return_skips: bool = False,
                          remat: bool = False, plane_out: bool = False,
                          sr_head_form: str = "auto",
                          pallas_conv=False):
    """Forward identical to SegModel.apply (models/segnet.py:176-186) with
    packed high-res stages. Returns lr_logits, (lr_logits, hr_logits) when
    ``dual``, or (lr, hr, skips) when ``return_skips`` (the KD student
    interface, seg_model.py:207-208; skips are unpacked — XLA dead-code-
    eliminates the unpacking of any skip the caller ignores).

    Differentiable end-to-end (weight packing is linear), so it serves the
    training step as well as eval.

    remat: True wraps every encoder/decoder stage and the SR head in
    jax.checkpoint — backward-pass activation storage drops to the stage
    boundaries (the skips), which is what makes training at real
    plans.json patch sizes fit in 16 GB HBM (measured: the un-remat
    fwd+bwd at batch 2 x (16,256,320) wants 45.8 GB). "hires" checkpoints
    only the full/half-resolution stages (encoder 0-1, the last two
    decoder stages, the SR head) — those hold ~90% of the activation
    bytes, while the cheap-to-store deep stages carry most of the
    recompute FLOPs, so selective remat trades a little HBM for less
    recomputation. Exact math either way — rematerialization only
    recomputes.

    plane_out: emit logits as per-class PLANES (B, C, D, H, W) instead of
    channel-last — the layout the aligned-grid Pallas accumulate kernel
    consumes (ops/pallas_tail.py). Costs NOTHING extra on the packed path:
    the final depth_to_space simply runs per class (packed channel order
    is (cell, class), so class c's four cells are ``lg[..., c::C]``).

    pallas_conv: False (default, XLA convs), "cat" (fuse ONLY the decoder
    skip concat into pconv_pad11_cat — the measured-positive production
    Pallas configuration), or True (every covered stride-1 class through
    ops.pallas_pconv — a measured engine-level negative kept for the A/B
    harness, docs/BENCHMARKS.md round 5).

    sr_head_form: which (mathematically identical) emission of the dual SR
    head to use — "auto" (fused upsample/conv1 + z-paired stride-2 conv2,
    the fastest form and since the one-hot CE fix also the smallest in
    training: 4.30 GiB peak at production geometry), "cell4" (fused conv1
    + (4,4)-cell conv2, no z-pairing), or "legacy" (explicit z-upsample +
    (2,2)-cell convs, the round-3 form). cell4/legacy are retained as
    fallbacks for memory-tighter geometries (sweep:
    experiments/stage2_head_mem.py)."""
    a = dict(arch)
    n = a["n_stages"]
    feats = a["features_per_stage"]
    kernels = [_to3(k) for k in a["kernel_sizes"]]
    strides = [_to3(s) for s in a["strides"]]
    p = params["params"]
    # flax promotes inputs/kernels to a common dtype; these functional convs
    # require it explicitly (bf16 uploads meet fp32 training params when
    # evaluate() runs mid-training)
    leaf = jax.tree_util.tree_leaves(p)[0]
    common = jnp.promote_types(x.dtype, leaf.dtype)
    x = x.astype(common)
    if leaf.dtype != common:
        p = jax.tree.map(lambda t: t.astype(common), p)
    penc, pdec = p["encoder"], p["decoder"]

    def _ckpt(kind: str, idx: int = 0):
        if not remat:
            return lambda f: f
        if remat == "hires":
            if kind == "enc":
                use = idx <= 1
            elif kind == "dec":
                use = idx >= n - 3
            else:                     # sr_head: 4x-D full res, always
                use = True
            return jax.checkpoint if use else (lambda f: f)
        return jax.checkpoint

    maybe_ckpt = _ckpt("head")

    # ---------------- encoder: each stage ends ALIGNED (or unpacked)
    cur, layout, cur_tw = x, "u", None
    skips = []  # (tensor, layout, true offset width or None)
    for s in range(n):
        n_convs = a["n_conv_per_stage"][s]
        out_layout = layout
        out_tw = cur_tw

        def enc_stage(cur_in, sp, *, _s=s, _n=n_convs, _in=layout,
                      _tw=cur_tw):
            # layout decisions are trace-time static (they derive from
            # shapes); smuggle the final one out through the closure
            nonlocal out_layout, out_tw
            lay, tw = _in, _tw
            y = cur_in
            for i in range(_n):
                st = strides[_s] if i == 0 else (1, 1, 1)
                remaining = _n - i
                if lay == "u":
                    want = "o" if remaining >= 2 else "a"
                else:
                    want = "a"
                y, lay, tw = _conv_norm_act(
                    y, lay, sp[f"conv_{i}"], kernels[_s], st, feats[_s], a,
                    pack_max_channels=pack_max_channels, want_out=want,
                    tw=tw, pallas=pallas_conv)
            out_layout, out_tw = lay, tw
            if isinstance(y, _Deferred):   # stage must end finalized
                y = y.materialize()
            return y

        cur = _ckpt("enc", s)(enc_stage)(cur, penc[f"stage_{s}"])
        layout, cur_tw = out_layout, out_tw
        skips.append((cur, layout, cur_tw))

    # ---------------- decoder
    lres, lres_layout, lres_tw = skips[-1]
    seg_logits = None
    features = None
    features_layout = "u"
    features_tw = None
    cur_tw = None
    for s in range(n - 1):
        ridx = n - 2 - s
        stride = strides[n - 1 - s]
        out_ch = feats[ridx]
        wt = pdec[f"transpconv_{s}"]["kernel"]
        bt = pdec[f"transpconv_{s}"].get("bias")
        skip, skip_layout, skip_tw = skips[ridx]

        h_t, w_t = _true_hw(skip, skip_layout, skip_tw)
        pack_here = (_packable(kernels[ridx], h_t, w_t, out_ch,
                               pack_max_channels)
                     and stride[1] == 2 and stride[2] == 2
                     and skip_layout in ("a", "u"))

        lres = _unpack(lres, lres_layout, lres_tw)
        lres_layout = "u"

        out_layout = "u"
        out_tw = None

        def dec_stage(lres_in, skip_in, tp, sp, *, _s=s, _ridx=ridx,
                      _pack=pack_here, _skip_layout=skip_layout,
                      _skip_tw=skip_tw, _out_ch=out_ch, _stride=stride):
            nonlocal out_layout, out_tw
            wt_ = tp["kernel"]
            bt_ = tp.get("bias")
            tw = None
            if _pack:
                up = pointwise_packed_transpconv(
                    lres_in, pack_transpconv_weights(wt_),
                    pack_bias(bt_) if bt_ is not None else None)  # ALIGNED
                skip_p = (skip_in if _skip_layout == "a"
                          else space_to_depth_hw(skip_in))
                # conv_0 receives the PAIR: _conv_norm_act either fuses
                # the concat into pconv_pad11_cat (pallas) or
                # concatenates there (identical XLA fusion either way)
                y = (up, skip_p)
                lay = "a"
                skip_ch = (skip_in.shape[-1] // 4 if _skip_layout == "a"
                           else skip_in.shape[-1])
                splits = [_out_ch, skip_ch]
                for i in range(a["n_conv_per_stage_decoder"][_s]):
                    y, lay, tw = _conv_norm_act(
                        y, lay, sp[f"conv_{i}"], kernels[_ridx], (1, 1, 1),
                        _out_ch, a, pack_max_channels=pack_max_channels,
                        in_splits=splits if i == 0 else None, want_out="a",
                        tw=tw, pallas=pallas_conv)
            else:
                up = _transpconv_std(lres_in, wt_, bt_, _stride)
                y = jnp.concatenate(
                    [up, _unpack(skip_in, _skip_layout, _skip_tw)],
                    axis=-1)
                lay = "u"
                for i in range(a["n_conv_per_stage_decoder"][_s]):
                    y, lay, tw = _conv_norm_act(
                        y, lay, sp[f"conv_{i}"], kernels[_ridx], (1, 1, 1),
                        _out_ch, a, pack_max_channels=pack_max_channels,
                        want_out="a", tw=tw, pallas=pallas_conv)
            out_layout, out_tw = lay, tw
            if isinstance(y, _Deferred):   # stage must end finalized
                y = y.materialize()
            return y

        cur = _ckpt("dec", s)(dec_stage)(lres, skip,
                                         pdec[f"transpconv_{s}"],
                                         pdec[f"stage_{s}"])
        layout, cur_tw = out_layout, out_tw

        if s == n - 2:
            wseg = pdec[f"seg_layer_{s}"]["kernel"]
            bseg = pdec[f"seg_layer_{s}"]["bias"]
            n_cls = wseg.shape[-1]
            if layout in ("a", "o"):
                # pointwise seg head in packed space; unpack only the tiny
                # (num_classes-channel) logits, not the 32-ch features
                wp = pack_pointwise_weights(wseg[0, 0, 0].astype(cur.dtype))
                lg = jnp.einsum("bdhwc,ce->bdhwe", cur, wp,
                                preferred_element_type=cur.dtype)
                lg = lg + pack_bias(bseg)
                if layout == "o":
                    lg = _mask_offset(lg, wseg.shape[-1], tw=cur_tw)
                if plane_out:
                    # per-class depth_to_space (packed channel order is
                    # (cell, class)) — same total traffic as one d2s
                    seg_logits = jnp.stack(
                        [_unpack(lg[..., c::n_cls], layout, cur_tw)[..., 0]
                         for c in range(n_cls)], axis=1)
                else:
                    seg_logits = _unpack(lg, layout, cur_tw)
            else:
                seg_logits = _conv_std(cur, wseg, bseg, (1, 1, 1))
                if plane_out:
                    seg_logits = jnp.moveaxis(seg_logits, -1, 1)
            features, features_layout = cur, layout
            features_tw = cur_tw
        lres, lres_layout, lres_tw = cur, layout, cur_tw

    if not dual and not return_skips:
        return seg_logits

    from ..ops.bspline import upsample_axis_linear

    w1, b1 = p["sr_head_conv1"]["kernel"], p["sr_head_conv1"]["bias"]
    w2, b2 = p["sr_head_conv2"]["kernel"], p["sr_head_conv2"]["bias"]
    def sr_head(feats_in, w1_, b1_, w2_, b2_):
        if features_layout == "a":
            # SR head fully packed: it runs at upscale*D FULL resolution
            # with C=16/32 — unpacked, its activations are mostly lane
            # padding (the round-1 OOM). D-upsampling commutes with
            # in-plane packing.
            if w1_.shape[0] == 3 and sr_head_form != "legacy":
                # upsample folded into conv1: spatial conv at LR depth +
                # one composite z-matmul (exact; ~1.2x faster and skips
                # the 4x-depth 128-lane intermediate — dual_pieces.py)
                h1 = fused_upsample_conv1(feats_in, w1_, b1_, upscale)
            else:
                up = upsample_axis_linear(feats_in, upscale, axis=1,
                                          align_corners=True)
                wp1 = pack_conv_weights(w1_)
                h1 = conv_packed(up, wp1, pack_bias(b1_), hw_pad="pad11")
            h1 = _mask_offset(jax.nn.relu(h1), w1_.shape[-1])
            ncl = w2_.shape[-1]
            # conv2 (5^3, 16 -> num_classes): the (2,2)-cell form emits
            # 4*ncl=8 lanes and runs ~4.8 TF/s (MXU pads the output dim to
            # 128); the stride-2 (4,4)-cell form emits 16*ncl=32 lanes at
            # ~25/16 the raw MACs and is ~5x faster end-to-end (measured,
            # experiments/conv2_lanes.py + dual_pieces.py). Needs true H,W
            # % 4 == 0 (h1 is offset-packed: plane = H/2+1).
            if ((h1.shape[2] - 1) % 2 == 0 and (h1.shape[3] - 1) % 2 == 0
                    and sr_head_form != "legacy"):
                if h1.shape[1] % 2 == 0 and sr_head_form != "cell4":
                    # z-paired variant: 32*ncl=64 output lanes (the full
                    # fast MXU regime) for 6/5 the z taps
                    wp2 = pack_conv_weights_cell4z2(w2_)
                    out = conv_packed_s2_cell4z2(
                        h1, wp2, pack_bias_cell4z2(b2_))
                    planes = unpack_cell4z2(out, ncl)
                    if plane_out:
                        return jnp.stack(planes, axis=1)
                    return jnp.stack(planes, axis=-1)
                wp2 = pack_conv_weights_cell4(w2_)   # o -> (4,4)-cell a
                out = conv_packed_s2_cell4(h1, wp2, pack_bias_cell4(b2_))
                if plane_out:
                    return jnp.stack(
                        [depth_to_space_cell(out[..., c::ncl], 4)[..., 0]
                         for c in range(ncl)], axis=1)
                return depth_to_space_cell(out, 4)
            wp2 = pack_conv_weights(w2_)     # 5x5 -> (4,4) cells, o -> a
            out = conv_packed(h1, wp2, pack_bias(b2_))
            if plane_out:
                return jnp.stack(
                    [depth_to_space_hw(out[..., c::ncl])[..., 0]
                     for c in range(ncl)], axis=1)
            return depth_to_space_hw(out)
        f = _unpack(feats_in, features_layout, features_tw)
        up = upsample_axis_linear(f, upscale, axis=1, align_corners=True)
        h1 = jax.nn.relu(_conv_std(up, w1_, b1_, (1, 1, 1)))
        hr_ = _conv_std(h1, w2_, b2_, (1, 1, 1))
        return jnp.moveaxis(hr_, -1, 1) if plane_out else hr_

    hr = maybe_ckpt(sr_head)(features, w1, b1, w2, b2)
    if return_skips:
        return seg_logits, hr, [_unpack(t, l, tw_) for t, l, tw_ in skips]
    return seg_logits, hr
