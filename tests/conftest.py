"""Test harness config: force CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh (the
fake-backend substitute for a TPU pod, per SURVEY §4). Must run before jax
is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# A developer's configured base dir (package.cfg written by a CLI run, or a
# TMAT_TPU_BASE_DIR left in the shell) must not redirect the shipped-artifact
# lookups (defs.model_training_path) to a scratch dir mid-suite. Point the
# suite at a fresh temp dir: lookups fall back per-file to the packaged tree,
# and tool mains that bootstrap BASE_DIR (config copies, compile cache) write
# there instead of into the repo.
import atexit
import shutil
import tempfile

_test_base_dir = tempfile.mkdtemp(prefix="tmat_test_base_")
os.environ["TMAT_TPU_BASE_DIR"] = _test_base_dir
# one directory per pytest session would otherwise accumulate forever
# (the leak bench.py's stable-path comment designs against)
atexit.register(shutil.rmtree, _test_base_dir, ignore_errors=True)
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
