"""Mixed-precision training policy: bf16 compute, fp32 master weights.

The reference trains everything in fp32 (torch defaults, train_all.py:
114-152, 519-556) — there is no analogue of this module; it is a pure
TPU-first win. The TPU MXU runs bf16 matmuls/convs at ~2x the fp32-ish
(f32-accumulated) rate and halves activation HBM traffic, which is what the
two hot training loops (SURVEY §3.2/§3.5) are bound by.

Design (the standard JAX pattern, cf. jmp):

  - master params stay fp32 in the optimizer state;
  - the loss function casts params + batch to ``compute_dtype`` before the
    model forward (the cast is differentiable: its transpose casts the
    incoming bf16 cotangents back to fp32, so optimizer updates accumulate
    in fp32);
  - logits/outputs are cast back to fp32 at the loss boundary — every loss
    reduction (dice denominators, CE logsumexp, means over millions of
    voxels) runs fp32;
  - norm statistics inside the packed forward already accumulate fp32
    (ops/pack2d.instance_norm_packed), and the functional instance norm
    upcasts the same way.

bf16 needs no loss scaling (same exponent range as fp32), so there is no
scaled-grad machinery here — ``policy("fp32")`` is the identity policy and
the default remains exact reference-parity fp32 unless a caller opts in.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    """compute_dtype: dtype params/inputs are cast to for the forward.
    reduce_dtype: dtype losses/reductions run in (outputs are cast to it
    before any loss math)."""

    compute_dtype: jnp.dtype
    reduce_dtype: jnp.dtype = jnp.float32

    @property
    def is_identity(self) -> bool:
        return self.compute_dtype == jnp.float32

    def cast_compute(self, tree):
        """Cast every inexact leaf to compute_dtype (ints/bools pass
        through — labels and index tensors must stay integral)."""
        if self.is_identity:
            return tree
        return jax.tree.map(
            lambda t: t.astype(self.compute_dtype)
            if jnp.issubdtype(jnp.asarray(t).dtype, jnp.inexact) else t,
            tree)

    def cast_reduce(self, tree):
        if self.is_identity:
            return tree
        return jax.tree.map(
            lambda t: t.astype(self.reduce_dtype)
            if jnp.issubdtype(jnp.asarray(t).dtype, jnp.inexact) else t,
            tree)


_POLICIES = {
    "fp32": Policy(compute_dtype=jnp.float32),
    "f32": Policy(compute_dtype=jnp.float32),
    "bf16": Policy(compute_dtype=jnp.bfloat16),
    "bfloat16": Policy(compute_dtype=jnp.bfloat16),
}


def policy(name: str | Policy | None) -> Policy:
    """Resolve a policy by name ('bf16' / 'fp32'); None -> fp32 identity."""
    if name is None:
        return _POLICIES["fp32"]
    if isinstance(name, Policy):
        return name
    try:
        return _POLICIES[str(name).lower()]
    except KeyError:
        raise ValueError(
            f"unknown precision policy {name!r}; use 'bf16' or 'fp32'"
        ) from None
