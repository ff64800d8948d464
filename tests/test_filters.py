"""Unit tests for ops/filters.py against independently-computed golden math."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage, signal

from tmat_tpu.ops import filters


def test_cv2_gaussian_kernel_fixed_small():
    np.testing.assert_allclose(
        filters.cv2_gaussian_kernel(5), [1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16]
    )
    np.testing.assert_allclose(filters.cv2_gaussian_kernel(3), [0.25, 0.5, 0.25])


def test_cv2_deriv_kernels():
    np.testing.assert_allclose(filters.cv2_deriv_kernel(2, 5), [1, 0, -2, 0, 1])
    np.testing.assert_allclose(filters.cv2_deriv_kernel(0, 5), [1, 4, 6, 4, 1])
    np.testing.assert_allclose(filters.cv2_deriv_kernel(2, 3), [1, -2, 1])


def test_sepconv_matches_scipy_correlate(rng):
    img = rng.rand(17, 23).astype(np.float32)
    ky = filters.cv2_gaussian_kernel(5)
    # reflect (REFLECT_101) padding == scipy mode='mirror'
    expected = ndimage.correlate1d(img, ky, axis=0, mode="mirror")
    expected = ndimage.correlate1d(expected, ky, axis=1, mode="mirror")
    got = np.asarray(filters.sepconv2d(jnp.asarray(img), ky, ky, mode="reflect"))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_laplacian_cv2_on_quadratic():
    # For f(x,y) = x^2, the ksize=5 Laplacian is the 2nd-difference kernel
    # [1,0,-2,0,1] (=4 per unit step with spacing 1 -> sum 2*... ) smoothed
    # by [1,4,6,4,1]; interior response is constant: 16 * 2? Compute directly.
    h = w = 11
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = x**2
    lap = np.asarray(filters.laplacian_cv2(jnp.asarray(img), 5))
    # d2/dx2 of x^2 = 2; kernel [1,0,-2,0,1] on x^2 gives 8 (spacing 2 taps),
    # smoothing [1,4,6,4,1] sums to 16 -> interior value = 8*16 = 128.
    interior = lap[4:-4, 4:-4]
    np.testing.assert_allclose(interior, 128.0, atol=1e-3)


def test_gaussian_skimage_matches_scipy(rng):
    img = rng.rand(32, 32).astype(np.float32)
    got = np.asarray(filters.gaussian(jnp.asarray(img), sigma=1.0))
    expected = ndimage.gaussian_filter(img, sigma=1.0, mode="nearest", truncate=4.0)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_gaussian_batched_shape(rng):
    img = rng.rand(3, 4, 16, 16).astype(np.float32)
    out = filters.gaussian(jnp.asarray(img), 2.0)
    assert out.shape == img.shape


def test_median3x3_matches_scipy(rng):
    img = rng.rand(20, 20).astype(np.float32)
    got = np.asarray(filters.median3x3(jnp.asarray(img)))
    expected = ndimage.median_filter(img, size=3, mode="nearest")
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_unsharp_mask_sharpens_edge():
    img = np.zeros((16, 16), np.float32)
    img[:, 8:] = 1.0
    out = np.asarray(filters.unsharp_mask(jnp.asarray(img), 2.0, 2.0))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # Edge contrast should not decrease
    assert out[8, 9] >= img[8, 9] - 1e-6
