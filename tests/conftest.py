"""Test harness config: force CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh (the
fake-backend substitute for a TPU pod, per SURVEY §4). Must run before jax
is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's sitecustomize registers the TPU PJRT plugin with priority that
# overrides JAX_PLATFORMS; the config update below wins regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
