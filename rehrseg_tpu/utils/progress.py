"""Progress reporting (reference utils/misc_utils.py:6-37).

`parse_device` maps to JAX device selection; `LossProgBar` keeps the tqdm
postfix-of-losses interface but takes floats/jax scalars.
"""

from __future__ import annotations

import jax
from tqdm import tqdm


def parse_device(device_id: int = 0):
    """Pick a JAX device; falls back to whatever is available
    (misc_utils.py:6-13 picked one CUDA device or CPU)."""
    devices = jax.devices()
    if 0 <= device_id < len(devices):
        return devices[device_id]
    print("Device index not available; using default device.")
    return devices[0]


class LossProgBar:
    """tqdm wrapper showing running loss values (misc_utils.py:16-37)."""

    def __init__(self, total, update_amount, loss_names, precision: int = 4):
        self.total = total
        self.update_amount = update_amount
        self.precision = precision
        self.pbar = None
        self.pbar_dict = {name: float("inf") for name in loss_names}

    def __enter__(self):
        self.pbar = tqdm(total=self.total)
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.pbar.close()

    def update(self, loss_dict):
        for k, v in loss_dict.items():
            self.pbar_dict[k] = float(v)
        self.pbar.set_postfix(
            {k: f"{v:.{self.precision}f}" for k, v in self.pbar_dict.items()
             if v != 0})
        self.pbar.update(self.update_amount)
