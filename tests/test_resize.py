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


def test_host_lanczos4_matches_device_kernel():
    """resize_lanczos4_host (BLAS path, true a=4 kernel) must track the
    device lanczos path closely on smooth microscopy-like images — the
    two run the same pipeline stage on different backends."""
    import numpy as np
    import jax.numpy as jnp

    from tmat_tpu.ops.resize import resize, resize_lanczos4_host

    rng = np.random.RandomState(0)
    rr, cc = np.mgrid[0:140, 0:140]
    img = (
        120
        + 80 * np.sin(rr / 9.0)
        + 60 * np.cos(cc / 13.0)
        + rng.rand(140, 140) * 5
    ).astype(np.float32)
    stack = np.stack([img, img[::-1]])

    host = resize_lanczos4_host(stack, (48, 48))
    dev = np.asarray(resize(jnp.asarray(stack), (48, 48), "lanczos4"))
    # different kernels (a=4 vs jax lanczos5): close but not equal
    assert np.abs(host - dev).max() < 3.0  # of a ~255 range
    assert np.abs(host - dev).mean() < 0.5


def test_host_lanczos4_identity_and_weights():
    import numpy as np

    from tmat_tpu.ops.resize import _lanczos_weight_matrix, resize_lanczos4_host

    w = _lanczos_weight_matrix(100, 40)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    # identity resize reproduces the input (kernel hits integer samples)
    rng = np.random.RandomState(1)
    x = rng.rand(3, 32, 32).astype(np.float32)
    np.testing.assert_allclose(resize_lanczos4_host(x, (32, 32)), x, atol=1e-5)


def test_prep_hybrid_matches_device_prep():
    import numpy as np

    from tmat_tpu.models.preprocess import (
        prep_inv_depth_imgs,
        prep_inv_depth_imgs_hybrid,
    )

    rng = np.random.RandomState(2)
    rr, cc = np.mgrid[0:300, 0:300]
    stack = np.clip(
        40
        + 90 * np.exp(-((rr - 150) ** 2 + (cc - 150) ** 2) / 4000.0)
        + rng.rand(300, 300) * 10,
        0,
        255,
    ).astype(np.uint8)[None].repeat(2, axis=0)

    dev = np.asarray(prep_inv_depth_imgs(stack, (64, 64)))
    hyb = np.asarray(prep_inv_depth_imgs_hybrid(stack, (64, 64)))
    assert hyb.shape == dev.shape
    # post-rescale values span ~255; the kernels agree within a few units
    assert np.abs(hyb - dev).mean() < 1.5
    assert np.abs(hyb - dev).max() < 12.0
