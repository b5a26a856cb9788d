"""Stage-2 segmentation training step: dual LR+HR seg loss, uncertainty
weighting, and structural knowledge distillation from the frozen FLAVR
teacher.

Parity with the reference stage-2 loop (train_all.py:519-556) and
`get_intermediate_features` (train_all.py:85-112): the teacher encoder slides
a 4-slice window along z (zero-padded at the ends), keeps feature slice 1 per
window plus slice 2 of the last window, and concatenates to a full-depth
64-channel feature volume aligned with the student's stage-1 skip.

TPU-first: the reference runs D-1 sequential teacher forwards per step
(train_all.py:89-99); here all windows fold into one batched encoder forward
(one big MXU-friendly batch), under stop_gradient.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..losses import dc_and_weighted_ce
from ..data.normalize import zscore_batch
from .state import TrainState


def flavr_window_indices(depth: int) -> np.ndarray:
    """(depth-1, 4) gather indices into a z-padded (depth+2) volume.

    Window st covers original slices [st-1, st+2] with zero padding at the
    boundaries (train_all.py:89-97): in padded coordinates that is
    padded[st : st+4].
    """
    return np.arange(depth - 1)[:, None] + np.arange(4)[None, :]


def flavr_teacher_features(flavr_model, flavr_params, img_lr: jnp.ndarray,
                           label_lr: jnp.ndarray, feature_index: int = 1,
                           window_chunk: int | None = None,
                           compute_dtype=None):
    """Teacher feature volume for KD (get_intermediate_features parity).

    img_lr, label_lr: (B, D, H, W, 1). Returns (B, D, H', W', C') where
    feature_index=1 selects the 64-channel layer1 features at H/2.

    window_chunk: process the B*(D-1) z-windows in chunks of this size via
    lax.map (memory cap at production patch sizes); None = one big batch.
    compute_dtype: cast the (zscore-normalized, fp32) windows to this dtype
    for the encoder forward — pass the caller's bf16 policy dtype together
    with bf16-cast flavr_params (flax promotes input x kernel, so a fp32
    input would silently upcast the whole teacher).
    """
    img = zscore_batch(img_lr)
    x = jnp.concatenate([img, label_lr], axis=-1)  # (B, D, H, W, 2)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    b, d, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    idx = flavr_window_indices(d)  # (d-1, 4)
    windows = padded[:, idx]  # (B, d-1, 4, H, W, C)
    flat = windows.reshape(b * (d - 1), 4, h, w, c)

    def encode(batch):
        return flavr_model.apply(flavr_params, batch,
                                 return_intermediate_feature=True)

    n = flat.shape[0]
    if window_chunk is not None and window_chunk < n:
        pad_n = (-n) % window_chunk
        if pad_n:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad_n, *flat.shape[1:]), flat.dtype)])
        chunks = flat.reshape(-1, window_chunk, 4, h, w, c)
        feats_c = jax.lax.map(lambda ch: encode(ch)[feature_index], chunks)
        f = feats_c.reshape(-1, *feats_c.shape[2:])[:n]
    else:
        feats = encode(flat)
        f = feats[feature_index]  # (B*(d-1), 4, H', W', C')
    _, fd, fh, fw, fc = f.shape
    f = f.reshape(b, d - 1, fd, fh, fw, fc)
    center = f[:, :, 1]          # slice 1 of each window -> slices 0..d-2
    last = f[:, -1:, 2]          # slice 2 of the last window -> slice d-1
    out = jnp.concatenate([center, last], axis=1)  # (B, d, H', W', C')
    return jax.lax.stop_gradient(out)


def ds_scales_from_arch(arch: dict) -> list[tuple]:
    """Per-decoder-output downsampling scales for deep supervision:
    cumulative stride products, highest resolution first (nnUNet semantics;
    the reference hardcodes the brain-config list at seg_utils.py:364)."""
    strides = [tuple(s) if not isinstance(s, int) else (s, s, s)
               for s in arch["strides"]]
    scales = [(1, 1, 1)]
    cur = np.ones(3, dtype=np.int64)
    for s in strides[1:]:
        cur = cur * np.asarray(s)
        scales.append(tuple(int(v) for v in cur))
    # decoder outputs: n_stages-1 resolutions, highest first
    return scales[: len(strides) - 1]


def downsample_label(label: jnp.ndarray, scale) -> jnp.ndarray:
    """Nearest (strided) downsample of a (B, D, H, W, 1) label by integer
    per-axis factors (DownsampleSegForDSTransform2 equivalent for the
    integer-factor case)."""
    sd, sh, sw = (int(s) for s in scale)
    return label[:, ::sd, ::sh, ::sw]


class SegBatch(NamedTuple):
    img: jnp.ndarray            # (B, D, H, W, 1) LR pseudo image
    label_lr: jnp.ndarray       # (B, D, H, W, 1)
    label_hr: jnp.ndarray       # (B, D*sep, H, W, 1)
    uncertainty_lr: jnp.ndarray  # (B, D, H, W, 1) or dummy zeros


def make_seg_train_step(seg_model, tx: optax.GradientTransformation,
                        *, enable_uncertainty: bool,
                        enable_distillation: bool,
                        flavr_model=None,
                        distiller=None,
                        deep_supervision: bool = False,
                        teacher_window_chunk: int | None = None,
                        donate: bool = True,
                        packed: bool = True,
                        remat: bool = True,
                        precision: str | None = None,
                        sr_head_form: str = "auto") -> Callable:
    """Returns jitted step(state, flavr_params, batch) -> (state, metrics).

    `state.params` is {'seg': seg_params, 'distiller': distiller_params} when
    distillation is on (the reference optimizes both jointly,
    train_all.py:511-513). With deep_supervision the LR loss is the
    exponentially-weighted sum over decoder resolutions
    (seg_utils.py:363-371); the seg_model must be built with
    deep_supervision=True.

    packed: run the forward (and therefore the backward) through the
    space-to-depth packed layout (models/segnet_packed.py) — identical
    math, measured materially faster on chip; automatically ignored when
    deep_supervision is on (the packed forward has no DS heads) and
    per-stage whenever patch dims are odd.
    remat: checkpoint each UNet stage + the SR head (packed path only) —
    REQUIRED to fit real plans.json patches in 16 GB HBM (the plain
    fwd+bwd at batch 2 x (16,256,320) wants 45.8 GB).
    precision: 'bf16' runs the student forward/backward and the frozen
    teacher in bfloat16 against fp32 master weights (train.precision);
    logits are cast back to fp32 at the loss boundary so every dice/CE/KD
    reduction stays fp32. None/'fp32' = exact reference-parity step.
    sr_head_form: packed emission of the dual SR head ('auto'|'cell4'|
    'legacy', see segmodel_apply_packed) — identical math, different
    peak-HBM/backward cost. 'auto' (the eval emission) is the default:
    it is both the fastest AND the smallest form (271-275 ms/step,
    4.30 GiB peak at B=2 x (16,256,320) — experiments/stage2_head_mem.py
    after the one-hot CE fix in losses.py freed ~11.7 GiB of gather/
    scatter live buffers). The knob remains as a fallback for memory-
    tighter geometries.
    """
    from ..losses import deep_supervision_weights
    from .precision import policy as _policy

    pol = _policy(precision)
    ds_scales = (ds_scales_from_arch(seg_model.arch)
                 if deep_supervision else None)
    use_packed = bool(packed) and not deep_supervision
    if use_packed:
        from ..models.segnet_packed import segmodel_apply_packed
        packed_arch = dict(seg_model.arch)
        packed_upscale = seg_model.upscale

    def loss_fn(params, flavr_params, batch: SegBatch):
        seg_params = params["seg"] if enable_distillation else params
        seg_params = pol.cast_compute(seg_params)
        img_c = pol.cast_compute(batch.img)
        if use_packed:
            lr_logits, hr_logits, skips = segmodel_apply_packed(
                packed_arch, seg_params, img_c, dual=True,
                upscale=packed_upscale, pack_max_channels=64,
                return_skips=True, remat=remat,
                sr_head_form=sr_head_form)
        else:
            lr_logits, hr_logits, skips = seg_model.apply(
                seg_params, img_c, return_intermediate_feature=True)
        lr_logits = pol.cast_reduce(lr_logits)
        hr_logits = pol.cast_reduce(hr_logits)

        unc = batch.uncertainty_lr if enable_uncertainty else None
        weight_dice_lr = 0.0 if enable_uncertainty else 1.0
        if deep_supervision:
            weights = deep_supervision_weights(len(lr_logits))
            loss_lr = 0.0
            for w, lg, scale in zip(weights, lr_logits, ds_scales):
                if w == 0.0:
                    continue
                tgt = downsample_label(batch.label_lr, scale)
                u = downsample_label(unc, scale) if unc is not None else None
                loss_lr = loss_lr + w * dc_and_weighted_ce(
                    lg, tgt, u, weight_ce=1.0, weight_dice=weight_dice_lr)
        else:
            # checkpoint the loss terms alongside the rematted forward:
            # softmax/dice temporaries on the 4x-D HR grid are hundreds of
            # MB each and don't need to survive to the backward pass
            def _lr_loss(lg, tg, u):
                return dc_and_weighted_ce(lg, tg, u, weight_ce=1.0,
                                          weight_dice=weight_dice_lr)

            _lr_loss = jax.checkpoint(_lr_loss) if use_packed else _lr_loss
            loss_lr = _lr_loss(lr_logits, batch.label_lr, unc)

        def _hr_loss(lg, tg):
            return dc_and_weighted_ce(lg, tg, None, weight_ce=1.0,
                                      weight_dice=1.0)

        _hr_loss = jax.checkpoint(_hr_loss) if use_packed else _hr_loss
        loss_hr = _hr_loss(hr_logits, batch.label_hr)
        loss = loss_lr + loss_hr
        metrics = {"loss_lr": loss_lr, "loss_hr": loss_hr}

        if enable_distillation:
            teacher = flavr_teacher_features(
                flavr_model, pol.cast_compute(flavr_params), batch.img,
                batch.label_lr, window_chunk=teacher_window_chunk,
                compute_dtype=(None if pol.is_identity
                               else pol.compute_dtype))
            # KD math (pairwise-sim matrices, cosine) reduces in fp32; the
            # tiny distiller projection stays an fp32 module
            student = pol.cast_reduce(skips[1])
            teacher = pol.cast_reduce(teacher)
            kd = distiller.apply(params["distiller"], student, teacher)
            loss = loss + kd
            metrics["loss_kd"] = kd
        metrics["loss"] = loss
        return loss, metrics

    def step(state: TrainState, flavr_params, batch: SegBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, flavr_params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


# canonical remat-mode encodings: wire codes for the pod broadcast
# (pipeline auto-select) and display names (bench.py / logs) — keep the
# three consumers on ONE mapping
REMAT_WIRE = {False: 0, "hires": 1, True: 2}
REMAT_UNWIRE = {v: k for k, v in REMAT_WIRE.items()}
REMAT_NAMES = {False: "none", "hires": "hires", True: "all"}


def select_remat_mode(build_step, state, flavr_params, batch, *,
                      bytes_limit: int | None = None,
                      margin_bytes: int = 1 << 30,
                      candidates=(False, "hires", True)):
    """Pick the fastest remat mode whose compiler-reported peak HBM fits.

    Remat trades recompute for activation memory; since the one-hot CE fix
    (losses.py) the NO-remat step is ~15% faster when it fits (235 vs
    275 ms/step at production geometry, 8.4 GiB non-distilled peak —
    docs/BENCHMARKS.md "CE-gather fix"). But the peak depends on geometry,
    head form, and the distillation teacher, so instead of a static
    default this AOT-compiles the candidates fastest-to-safest and picks
    the first whose XLA memory analysis fits ``bytes_limit -
    margin_bytes``. Any compile failure (including the remote-compile
    helper crash class) falls through to the next candidate; remat=True
    (checkpoint every stage — the guaranteed-fit mode) is the terminal
    fallback and is never probed.

    build_step: mode -> jitted step(state, flavr_params, batch); the
    concrete pytrees are only lowered/compiled, never executed, so
    donation does not consume them. Returns (mode, reason).

    Notes: the chosen mode's executable is intentionally discarded — the
    caller's fresh jit re-lowers but hits the persistent compilation
    cache (~seconds), and calling the AOT executable directly would pin
    exact arg shardings/placements for the whole training loop (fragile
    against fresh host batches). On a pod, only the primary should run
    this (compiles take minutes); peers wait in the decision broadcast —
    if the primary process hard-crashes mid-probe the pod hangs in that
    collective, the same failure semantics as any lost pod member.
    """
    if bytes_limit is None:
        dev = jax.local_devices()[0]
        try:
            stats = dev.memory_stats() or {}
        except Exception:  # noqa: BLE001 — backends without memory_stats
            stats = {}
        bytes_limit = stats.get("bytes_limit")
        if not bytes_limit and dev.platform == "tpu":
            # some TPU attachments (e.g. the tunneled axon backend) return
            # no memory_stats; fall back to the generation's HBM capacity
            # (conservative published figures per chip). Token-exact match
            # on the version word — substring matching would hand e.g. a
            # v4i (8 GiB) the v4 budget (32 GiB) and select a step that
            # OOMs at runtime.
            kinds = {"v2": 8, "v3": 16, "v4": 32, "v4i": 8,
                     "v5e": 16, "v5p": 95, "v6e": 32,
                     ("v5", "lite"): 16, ("v6", "lite"): 32}
            toks = dev.device_kind.lower().replace("tpu", "").split()
            gib = None
            for k, v in kinds.items():
                if (toks == list(k) if isinstance(k, tuple)
                        else toks == [k]):
                    gib = v
                    break
            if gib:
                bytes_limit = gib << 30
    if not bytes_limit:
        return True, "device reports no bytes_limit; remat=all (safe default)"
    budget = int(bytes_limit) - int(margin_bytes)
    last_err = None
    for mode in candidates:
        if mode is True:
            break
        try:
            compiled = build_step(mode).lower(
                state, flavr_params, batch).compile()
            ma = compiled.memory_analysis()
            peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
                    ma.output_size_in_bytes - ma.alias_size_in_bytes)
        except Exception as e:  # noqa: BLE001 — surface in the reason only
            last_err = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
            continue
        if peak <= budget:
            return mode, (f"remat={mode!r}: peak {peak / 2**30:.2f} GiB fits "
                          f"{budget / 2**30:.2f} GiB budget")
    reason = "all probed candidates exceeded the budget or failed to compile"
    if last_err:
        reason += f" (last: {last_err})"
    return True, reason
