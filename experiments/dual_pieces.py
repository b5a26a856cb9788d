"""Where does the dual-engine HR-head time go? (VERDICT r4 item #3: the
dual LR+HR engine measures 0.25 parity-MFU; the HR 5^3 head's (4,4)-cell
packing carries ~2.6x raw-FLOP inflation.)

Times, at bench tile geometry (batch 8 TTA, patch (16,320,384), packed
aligned features (8,16,160,192,128)):

  - z-upsample x4 (matmul-form trilinear, ops/bspline)
  - conv1: 3^3 32->16 as (2,2)-cell packed conv (a->o) + relu/mask
  - conv2: 5^3 16->2 as (4,4)-cell packed conv (o->a) + depth_to_space
  - the full sr_head closure for reference
  - LR-vs-dual full model fwd delta (what the head costs inside the model)

Each piece is its own jit with scalar consume (tunnel sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from rehrseg_tpu.models import SegModel, DEFAULT_ARCH
from rehrseg_tpu.models.segnet_packed import segmodel_apply_packed
from rehrseg_tpu.ops.pack2d import (
    pack_conv_weights, pack_bias, conv_packed, depth_to_space_hw,
    offset_rim_mask)
from rehrseg_tpu.ops.bspline import upsample_axis_linear

PATCH = (16, 320, 384)
B = 8
UP = 4

arch = dict(DEFAULT_ARCH)
model = SegModel(num_classes=2, upscale=UP, arch=arch)
x0 = jnp.zeros((1, *PATCH, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), x0)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
p = params["params"]
w1, b1 = p["sr_head_conv1"]["kernel"], p["sr_head_conv1"]["bias"]
w2, b2 = p["sr_head_conv2"]["kernel"], p["sr_head_conv2"]["bias"]

# the decoder's aligned packed feature tap: (B, D, H/2, W/2, 32*4) —
# generated on device (host gen + tunnel upload costs minutes at this size)
feats = jax.random.normal(
    jax.random.key(1),
    (B, PATCH[0], PATCH[1] // 2, PATCH[2] // 2, 128), jnp.bfloat16) * 0.1
jax.block_until_ready(feats)


def timed(name, fn, *args, reps=3, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    note = ""
    if flops:
        note = f"  ({flops / min(ts) / 1e12:5.1f} TFLOP/s parity)"
    print(f"{name}: {ms:7.1f} ms{note}", flush=True)
    return min(ts)


@jax.jit
def up_only(f):
    u = upsample_axis_linear(f, UP, axis=1, align_corners=True)
    return u.astype(jnp.float32).sum()


@jax.jit
def conv1_only(f):
    u = upsample_axis_linear(f, UP, axis=1, align_corners=True)
    wp1 = pack_conv_weights(w1)
    h1 = conv_packed(u, wp1, pack_bias(b1), hw_pad="pad11")
    m = offset_rim_mask(h1.shape[2], h1.shape[3], w1.shape[-1], h1.dtype)
    return (jax.nn.relu(h1) * m).astype(jnp.float32).sum()


@jax.jit
def full_head_old(f):
    # the round-3 conv2 form: (4,4)-kernel stride-1, 8 output lanes
    u = upsample_axis_linear(f, UP, axis=1, align_corners=True)
    wp1 = pack_conv_weights(w1)
    h1 = conv_packed(u, wp1, pack_bias(b1), hw_pad="pad11")
    m = offset_rim_mask(h1.shape[2], h1.shape[3], w1.shape[-1], h1.dtype)
    h1 = jax.nn.relu(h1) * m
    wp2 = pack_conv_weights(w2)
    out = depth_to_space_hw(conv_packed(h1, wp2, pack_bias(b2)))
    return out.astype(jnp.float32).sum()


@jax.jit
def full_head(f):
    u = upsample_axis_linear(f, UP, axis=1, align_corners=True)
    wp1 = pack_conv_weights(w1)
    h1 = conv_packed(u, wp1, pack_bias(b1), hw_pad="pad11")
    m = offset_rim_mask(h1.shape[2], h1.shape[3], w1.shape[-1], h1.dtype)
    h1 = jax.nn.relu(h1) * m
    from rehrseg_tpu.ops.pack2d import (
        pack_conv_weights_cell4, pack_bias_cell4, conv_packed_s2_cell4,
        depth_to_space_cell)
    wp2 = pack_conv_weights_cell4(w2)
    out = depth_to_space_cell(
        conv_packed_s2_cell4(h1, wp2, pack_bias_cell4(b2)), 4)
    return out.astype(jnp.float32).sum()


@jax.jit
def full_head_z2(f):
    u = upsample_axis_linear(f, UP, axis=1, align_corners=True)
    wp1 = pack_conv_weights(w1)
    h1 = conv_packed(u, wp1, pack_bias(b1), hw_pad="pad11")
    m = offset_rim_mask(h1.shape[2], h1.shape[3], w1.shape[-1], h1.dtype)
    h1 = jax.nn.relu(h1) * m
    from rehrseg_tpu.ops.pack2d import (
        pack_conv_weights_cell4z2, conv_packed_s2_cell4z2, unpack_cell4z2,
        pack_bias_cell4z2)
    wp2 = pack_conv_weights_cell4z2(w2)
    out = conv_packed_s2_cell4z2(h1, wp2, pack_bias_cell4z2(b2))
    planes = unpack_cell4z2(out, w2.shape[-1])
    return sum(p.astype(jnp.float32).sum() for p in planes)


@jax.jit
def full_head_fused(f):
    from rehrseg_tpu.ops.pack2d import (
        fused_upsample_conv1, pack_conv_weights_cell4z2,
        conv_packed_s2_cell4z2, unpack_cell4z2, pack_bias_cell4z2)
    h1 = fused_upsample_conv1(f, w1, b1, UP)
    m = offset_rim_mask(h1.shape[2], h1.shape[3], w1.shape[-1], h1.dtype)
    h1 = jax.nn.relu(h1) * m
    wp2 = pack_conv_weights_cell4z2(w2)
    out = conv_packed_s2_cell4z2(h1, wp2, pack_bias_cell4z2(b2))
    planes = unpack_cell4z2(out, w2.shape[-1])
    return sum(p.astype(jnp.float32).sum() for p in planes)


@jax.jit
def lr_model(b):
    return segmodel_apply_packed(arch, params, b, pack_max_channels=64
                                 ).astype(jnp.float32).sum()


@jax.jit
def dual_model(b):
    lr, hr = segmodel_apply_packed(arch, params, b, pack_max_channels=64,
                                   dual=True, upscale=UP)
    return lr.astype(jnp.float32).sum() + hr.astype(jnp.float32).sum()


if __name__ == "__main__":
    d, h, w = PATCH
    vox_hr = B * d * UP * h * w
    fl_conv1 = vox_hr * 27 * 32 * 16 * 2
    fl_conv2 = vox_hr * 125 * 16 * 2 * 2
    print(f"parity GFLOP: conv1 {fl_conv1/1e9:.1f}, conv2 {fl_conv2/1e9:.1f}")
    timed("z-upsample x4 (matmul form)", up_only, feats)
    timed("upsample + conv1 (2,2)-cell + relu", conv1_only, feats,
          flops=fl_conv1)
    timed("full sr_head OLD conv2 (8-lane)", full_head_old, feats,
          flops=fl_conv1 + fl_conv2)
    timed("full sr_head NEW conv2 (s2-cell4)", full_head, feats,
          flops=fl_conv1 + fl_conv2)
    timed("full sr_head z2 conv2 (64-lane)", full_head_z2, feats,
          flops=fl_conv1 + fl_conv2)
    timed("full sr_head fused-up + z2", full_head_fused, feats,
          flops=fl_conv1 + fl_conv2)
    batch = jax.random.normal(jax.random.key(2), (B, *PATCH, 1),
                              jnp.bfloat16)
    jax.block_until_ready(batch)
    t_lr = timed("LR-only model fwd", lr_model, batch)
    t_dual = timed("dual model fwd", dual_model, batch)
    print(f"HR head inside model: {1e3 * (t_dual - t_lr):.1f} ms")
