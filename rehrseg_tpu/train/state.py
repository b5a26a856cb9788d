"""Minimal train state (params + optimizer state + step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params), step=0)
