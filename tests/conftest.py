"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Note: this machine's sitecustomize registers the remote-TPU ("axon") PJRT
plugin and force-sets jax_platforms="axon,cpu" via jax.config, which overrides
the JAX_PLATFORMS env var — so we must override through jax.config too, before
any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def small_image(rng):
    """Deterministic 64x48 RGB float image in [0,1]."""
    return rng.random((64, 48, 3), dtype=np.float32)
