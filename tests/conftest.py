"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment pre-imports jax with JAX_PLATFORMS=axon (real TPU tunnel), so
env vars alone don't stick — we must also update the live config before any
backend initializes. Tests always run on the virtual CPU platform so the
suite is hermetic and the multi-chip sharding paths are exercised on 8 fake
devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from rehrseg_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
