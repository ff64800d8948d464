"""Sato tubeness filter tests."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from tmat_tpu.ops.sato import gaussian_deriv_kernel, sato


def test_gaussian_deriv_kernels_match_scipy(rng):
    img = rng.rand(40).astype(np.float64)
    for order in (0, 1, 2):
        k = gaussian_deriv_kernel(2.0, order)
        # scipy's gaussian_filter1d correlates with the reversed kernel;
        # scipy mode='reflect' == numpy pad mode='symmetric'
        got = np.correlate(
            np.pad(img, (len(k) // 2,) * 2, mode="symmetric"), k[::-1], mode="valid"
        )
        expected = ndimage.gaussian_filter1d(img, 2.0, order=order, mode="reflect")
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_bright_ridge_strong_response(rng):
    img = rng.rand(64, 64).astype(np.float32) * 0.01
    img[32, :] += 1.0  # bright 1-px horizontal ridge
    out = np.asarray(sato(jnp.asarray(img), sigmas=(1, 2, 3)))
    # ridge row response dominates background
    assert out[32].mean() > 10 * out[10].mean()


def test_black_ridges_flag(rng):
    img = np.ones((64, 64), np.float32)
    img[32, :] = 0.0  # dark ridge
    bright = np.asarray(sato(jnp.asarray(img), sigmas=(1, 2), black_ridges=False))
    dark = np.asarray(sato(jnp.asarray(img), sigmas=(1, 2), black_ridges=True))
    assert dark[32].mean() > 10 * bright[32].mean()


def test_scale_selection_prefers_matched_width():
    # A wide bar responds more at large sigma than small
    img = np.zeros((96, 96), np.float32)
    img[40:56, :] = 1.0  # 16-px wide bar
    narrow = np.asarray(sato(jnp.asarray(img), sigmas=(1,)))
    wide = np.asarray(sato(jnp.asarray(img), sigmas=(8,)))
    assert wide[48].mean() > narrow[48].mean()


def test_batched_matches_per_slice(rng):
    stack = rng.rand(3, 48, 48).astype(np.float32)
    batched = np.asarray(sato(jnp.asarray(stack), sigmas=(1, 3)))
    for z in range(3):
        single = np.asarray(sato(jnp.asarray(stack[z]), sigmas=(1, 3)))
        np.testing.assert_allclose(batched[z], single, atol=1e-5)
