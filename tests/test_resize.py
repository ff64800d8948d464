"""Resize op unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tmat_tpu.ops.resize import (
    downsample_max_dim_shape,
    resize,
    target_shape_for_ratio,
)


def test_nearest_upsample_exact():
    img = np.arange(4, dtype=np.float32).reshape(2, 2)
    out = np.asarray(resize(jnp.asarray(img), (4, 4), "nearest"))
    np.testing.assert_array_equal(out[::2, ::2], img)
    np.testing.assert_array_equal(out[1::2, 1::2], img)


def test_linear_downsample_preserves_mean(rng):
    img = rng.rand(64, 64).astype(np.float32)
    out = np.asarray(resize(jnp.asarray(img), (16, 16), "linear"))
    assert abs(out.mean() - img.mean()) < 0.02


@pytest.mark.parametrize("method", ["linear", "lanczos", "lanczos4", "cubic"])
def test_methods_shape_and_dtype(rng, method):
    img = rng.randint(0, 255, (33, 47)).astype(np.uint8)
    out = np.asarray(resize(jnp.asarray(img), (20, 30), method))
    assert out.shape == (20, 30)
    assert out.dtype == np.uint8  # integer dtype preserved with rounding


def test_batched_leading_axes(rng):
    img = rng.rand(3, 5, 32, 32).astype(np.float32)
    out = resize(jnp.asarray(img), (16, 16), "linear")
    assert out.shape == (3, 5, 16, 16)


def test_target_shape_helpers():
    assert target_shape_for_ratio((100, 200), 0.625) == (62, 125)
    assert downsample_max_dim_shape((1000, 500), 512) == (512, 256)
    # reference rounding rule: round(), not floor
    assert target_shape_for_ratio((321, 321), 0.5) == (160, 160)
