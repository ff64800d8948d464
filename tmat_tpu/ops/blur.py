"""Iterative blur and distance-transform blur helpers.

Parity target: preprocessing.blur / dt_blur / sdt_blur
(preprocessing.py:118-183): iterative 3x3 cv2 Gaussian blurs applied to the
(signed) Euclidean distance transform of a thresholded image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.core.defs import MAX_UINT8
from tmat_tpu.ops.filters import cv2_gaussian_kernel, sepconv2d
from tmat_tpu.ops.morphology import euclidean_distance_transform
from tmat_tpu.ops.rescale import bin_thresh


def blur(img: jax.Array, blur_itr: int, k_size: int = 3, gs: bool = True):
    """Iterative cv2.GaussianBlur(k, sigma=0) (preprocessing.py:165-183)."""
    k = cv2_gaussian_kernel(k_size)
    out = jnp.asarray(img, jnp.float32)
    for _ in range(blur_itr):
        out = sepconv2d(out, k, k, mode="reflect")
    out = jnp.round(out)
    if gs:
        return out.astype(jnp.uint8)
    return out


def dt_blur(img: np.ndarray, blur_itr: int, k_size: int = 3):
    """Distance transform then iterative blur (preprocessing.py:118-135)."""
    mask = np.asarray(
        bin_thresh(jnp.asarray(img, jnp.float32), float(MAX_UINT8))
    ).round().astype(np.uint8)
    dt = euclidean_distance_transform(mask)
    return np.asarray(blur(jnp.asarray(dt), blur_itr, k_size))


def sdt_blur(img: np.ndarray, blur_itr: int, k_size: int = 3):
    """Signed distance transform then iterative blur
    (preprocessing.py:138-162)."""
    mask = np.asarray(
        bin_thresh(jnp.asarray(img, jnp.float32), float(MAX_UINT8))
    ).round().astype(np.uint8)
    sdt = euclidean_distance_transform(mask) - euclidean_distance_transform(
        np.logical_not(mask)
    )
    return np.asarray(blur(jnp.asarray(sdt), blur_itr, k_size, gs=False))
